"""Sessionization -- gap-based session assignment over an event stream.

Not in the reference's surface (it has only fixed sliding windows); added as
a first-class pipeline operator (task brief: "beyond the reference"). The
batch form is the classic lag-gap-cumsum: a session break occurs where the
gap to the previous event of the same user exceeds `gap`; the streaming form
is Spark's native ``session_window`` (same semantics: windows merge while
events arrive within the gap).

Money aggregation uses integer cents (testdata money columns are 2-decimal)
so sums are exact and cross-engine deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.time import epoch_ms, ntz_as_utc_instant

DEFAULT_GAP_MS = 30 * 60 * 1000


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    gap_ms: int = DEFAULT_GAP_MS,
) -> DataFrame:
    """Per-user sessions: (user_id, session_id, session_start_ms,
    session_end_ms, n_events, total_value). One shuffle on user_id; the
    cumulative-sum session id needs no second shuffle (same partitioning)."""
    w = Window.partitionBy(user_col).orderBy("ev_ms", id_col)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    base = events.select(
        F.col(user_col),
        F.col(id_col),
        epoch_ms(time_col).alias("ev_ms"),
        cents.alias("cents"),
    )
    gap = F.col("ev_ms") - F.lag("ev_ms").over(w)
    with_sid = base.withColumn(
        "is_new", F.when(gap.isNull() | (gap > gap_ms), 1).otherwise(0)
    ).withColumn("session_id", F.sum("is_new").over(run))
    return (
        with_sid.groupBy(user_col, "session_id")
        .agg(
            F.min("ev_ms").alias("session_start_ms"),
            F.max("ev_ms").alias("session_end_ms"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("cents"),
        )
        .select(
            user_col,
            "session_id",
            "session_start_ms",
            "session_end_ms",
            "n_events",
            (F.col("cents").cast("double") / 100).alias("total_value"),
        )
    )


def sessionize_sql(
    table: str = "events",
    user_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    gap_ms: int = DEFAULT_GAP_MS,
) -> str:
    return f"""
WITH base AS (
  SELECT {user_col}, {id_col}, epoch_ms({time_col}) AS ev_ms,
         CAST(round({value_col} * 100) AS BIGINT) AS cents
  FROM {table}
),
marked AS (
  SELECT *, CASE WHEN ev_ms - lag(ev_ms) OVER w IS NULL
                   OR ev_ms - lag(ev_ms) OVER w > {gap_ms} THEN 1 ELSE 0 END AS is_new
  FROM base
  WINDOW w AS (PARTITION BY {user_col} ORDER BY ev_ms, {id_col})
),
sid AS (
  SELECT *, sum(is_new) OVER (PARTITION BY {user_col} ORDER BY ev_ms, {id_col}
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked
)
SELECT {user_col}, CAST(session_id AS BIGINT) AS session_id,
       min(ev_ms) AS session_start_ms,
       max(ev_ms) AS session_end_ms, count(*) AS n_events,
       CAST(sum(cents) AS DOUBLE) / 100 AS total_value
FROM sid GROUP BY {user_col}, session_id
"""
# CAST(session_id AS BIGINT): DuckDB sum(INT) yields HUGEINT, which lands in
# pandas as float64 and could hash differently from Spark's int64.


def streaming_sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    time_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "60 seconds",
) -> DataFrame:
    """Streaming twin via native session_window (merging gap sessions)."""
    ts = ntz_as_utc_instant(time_col).alias("ts_i")
    return (
        events.select(ts, F.col(user_col))
        .withWatermark("ts_i", watermark)
        .groupBy(F.session_window("ts_i", gap).alias("w"), user_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.unix_millis("w.start").alias("session_start_ms"),
            F.unix_millis("w.end").alias("session_end_ms"),
            "n_events",
        )
    )
