"""Query catalog: every implemented operator registered as a named query
(SURVEY.md §2 coverage checklist) with a DuckDB oracle twin.

Contract (driver harness, __spark_entry__.py):
  * spark builder: (spark, sf_dir) -> DataFrame
  * oracle: ANSI SQL over pre-registered DuckDB views (region nation customer
    supplier part orders lineitem events documents embeddings), or None for
    non-SQL-expressible operators (weaker rows-only check).

Cross-engine determinism rules used throughout (see plans/rides.py and
functions/hashing.py):
  * float literals in shared SQL are E-notation (decimal literals would be
    DECIMAL-typed in both engines and change the arithmetic);
  * aggregates over doubles avoid sum-order nondeterminism by aggregating
    integers/exact values where the query allows;
  * timestamps are exposed as epoch millis BIGINT, months as 'yyyy-MM'
    strings (reference exposes window.getEnd as a long --
    PopularPlaces.java:139).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import windows
from . import rides as rides_plan

SparkBuilder = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    spark: SparkBuilder
    oracle: str | None
    doc: str = ""
    bench: bool = False  # include in bench.py headline set


CATALOG: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "", bench: bool = False):
    def deco(fn: SparkBuilder) -> SparkBuilder:
        CATALOG[name] = QuerySpec(name, fn, oracle, doc, bench)
        return fn

    return deco


def queries() -> dict[str, SparkBuilder]:
    return {name: spec.spark for name, spec in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in CATALOG.items() if spec.oracle is not None}


# ---------------------------------------------------------------------------
# RideCleansing (SURVEY §2 P1/F1 -- RideCleansing.java:68-76)
# ---------------------------------------------------------------------------

_RIDES = rides_plan.rides_cte("events")

_NYC_PRED = (
    "NOT (start_lon > -73.7e0 OR start_lon < -74.05e0) "
    "AND NOT (start_lat > 41.0e0 OR start_lat < 40.5e0) "
    "AND NOT (end_lon > -73.7e0 OR end_lon < -74.05e0) "
    "AND NOT (end_lat > 41.0e0 OR end_lat < 40.5e0)"
)


@register(
    "ride_cleansing",
    oracle=f"""
WITH rides AS ({_RIDES})
SELECT ride_id, is_start, epoch_ms(ts) AS ts_ms,
       start_lon, start_lat, end_lon, end_lat, passenger_cnt
FROM rides
WHERE {_NYC_PRED}
""",
    doc="P1/F1: keep rides that start AND end inside the NYC bbox "
    "(RideCleansing.java:68-76, GeoUtils.java:58-62).",
    bench=True,
)
def q_ride_cleansing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import geo

    r = rides_plan.rides_view(spark, sf_dir)
    in_nyc = geo.is_in_nyc("start_lon", "start_lat") & geo.is_in_nyc("end_lon", "end_lat")
    return r.where(in_nyc).select(
        "ride_id",
        "is_start",
        F.unix_millis("ts").alias("ts_ms"),
        "start_lon",
        "start_lat",
        "end_lon",
        "end_lat",
        "passenger_cnt",
    )


# ---------------------------------------------------------------------------
# PopularPlaces (SURVEY §2 W2/A8/P2/P4/P5/F2/F3/F4 -- PopularPlaces.java)
# Constants adapted to the 30-day testdata density; the operator's defaults
# stay at the reference's 15min/5min/20.
# ---------------------------------------------------------------------------

_PP_SIZE_MS = 6 * 3600 * 1000
_PP_SLIDE_MS = 3600 * 1000
_PP_K = _PP_SIZE_MS // _PP_SLIDE_MS
_PP_THRESHOLD = 10


def _popular_places_oracle(size_ms: int, slide_ms: int, threshold: int) -> str:
    k = size_ms // slide_ms
    return f"""
WITH rides AS ({_RIDES}),
nyc AS (
  SELECT ts, is_start,
         CAST(FLOOR((74.05e0 - abs(CASE WHEN is_start THEN start_lon ELSE end_lon END)) / 1.4e-3) AS INT)
         + CAST(FLOOR((41.0e0 - (CASE WHEN is_start THEN start_lat ELSE end_lat END)) / 1.25e-3) AS INT) * 250
           AS cell
  FROM rides
  WHERE {_NYC_PRED}
),
counted AS (
  SELECT cell, is_start,
         ((epoch_ms(ts) // {slide_ms}) - t.k) * {slide_ms} + {size_ms} AS window_end_ms,
         count(*) AS cnt
  FROM nyc CROSS JOIN (SELECT range AS k FROM range({k})) t
  GROUP BY 1, 2, 3
)
SELECT (74.05e0 - (cell % 250) * 1.4e-3 - 7e-4) * -1.0e0 AS center_lon,
       41.0e0 - (cell // 250) * 1.25e-3 - 6.25e-4 AS center_lat,
       window_end_ms, is_start, cnt
FROM counted WHERE cnt >= {threshold}
"""


@register(
    "popular_places",
    oracle=_popular_places_oracle(_PP_SIZE_MS, _PP_SLIDE_MS, _PP_THRESHOLD),
    doc="W2/A8/P2/P4/P5: NYC filter -> grid cell -> sliding window count -> "
    "threshold -> cell centers (PopularPlaces.java:71-97).",
    bench=True,
)
def q_popular_places(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = rides_plan.rides_view(spark, sf_dir)
    return windows.popular_places(r, window="6 hours", slide="1 hour", threshold=_PP_THRESHOLD)


def entry_query(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    """Flagship: PopularPlaces with a density-adjusted threshold so the
    sf0.001 smoke check returns rows."""
    r = rides_plan.rides_view(spark, sf_dir)
    return windows.popular_places(r, window="1 day", slide="6 hours", threshold=2)
