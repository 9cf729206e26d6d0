"""Derived taxi-ride view over the driver's ``events`` table.

The reference's streaming exercises run on NYC TaxiRide events
(TaxiRide.java:62-70); the driver testdata has no geo columns, so the geo
exercises run on a *deterministic* ride view derived from ``events`` with
pure integer/double arithmetic that evaluates bit-identically in Spark and
in the DuckDB oracle.

Shape (FIXTURES.md §1): ride_id, is_start, ts (event time), start/end
lon/lat, passenger_cnt. 40% of rides land on 10 hotspot grid-cell centers so
the PopularPlaces threshold fires (FIXTURES.md generator guidance); the rest
spread quasi-uniformly with ~10-13%% outside the NYC bbox so RideCleansing is
non-trivial (GeoUtils.java:29-32).

IMPORTANT: every float literal is E-notation -- plain decimal literals parse
as DECIMAL in both Spark SQL and DuckDB and would silently switch the
arithmetic from IEEE double to exact decimal, breaking cross-engine hash
parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# One SQL text, two engines: format with the events table/view name.
# Hotspot cells: x = 35 + 3*h (h = 0..9), y = 200 -> cell centers via
# GeoUtils.java:170-191 math; lat 40.749375 = center of row y=200.
RIDES_SQL = """
SELECT
  event_id AS ride_id,
  (event_id % 2) = 0 AS is_start,
  ts,
  CASE WHEN event_id % 5 < 2
       THEN -74.05e0 + (35 + 3 * (event_id % 10)) * 1.4e-3 + 7e-4
       ELSE -74.05e0 + ((event_id * 7919 + 13) % 3900) / 1e4 END AS start_lon,
  CASE WHEN event_id % 5 < 2
       THEN 40.749375e0
       ELSE 40.5e0 + ((event_id * 104729 + 7) % 5500) / 1e4 END AS start_lat,
  CASE WHEN event_id % 5 < 2
       THEN -74.05e0 + (35 + 3 * ((event_id * 3 + 1) % 10)) * 1.4e-3 + 7e-4
       ELSE -74.05e0 + ((event_id * 7919 + user_id * 31 + 1013) % 3900) / 1e4 END AS end_lon,
  CASE WHEN event_id % 5 < 2
       THEN 40.749375e0
       ELSE 40.5e0 + ((event_id * 104729 + user_id * 57 + 2029) % 5500) / 1e4 END AS end_lat,
  CAST(1 + event_id % 4 AS INT) AS passenger_cnt
FROM {events}
"""


def register_events(spark: SparkSession, sf_dir: str) -> str:
    """Register the events parquet as a temp view; returns the view name."""
    from ..sources import load_table

    load_table(spark, "events", sf_dir).createOrReplaceTempView("__fte_events")
    return "__fte_events"


def rides_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ride view as a DataFrame (runs the shared SQL through Catalyst)."""
    return spark.sql(RIDES_SQL.format(events=register_events(spark, sf_dir)))


def rides_cte(events_table: str = "events") -> str:
    """DuckDB-side CTE body for oracle queries."""
    return RIDES_SQL.format(events=events_table)
