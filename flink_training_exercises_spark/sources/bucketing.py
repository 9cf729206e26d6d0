"""Bucketed-table utilities: pre-shuffle once at write time, join forever
without an Exchange.

At 100 TB the dominant recurring cost of fact-to-fact joins (e.g.
lineitem x orders) is the shuffle. Bucketing both tables by the join key at
ingest amortizes that shuffle into the write: Spark's scan reports the
bucket distribution, Catalyst drops both Exchanges, and the sort-merge join
runs entirely map-side. These helpers wrap the write/read pattern; the test
asserts the Exchange-free plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key -- no shuffle."""
    return spark.table(left_table).join(spark.table(right_table), key)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle Exchange (excluding AQE
    wrappers) -- the property bucketing removes."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    return any(
        line.strip().split(" ", 2)[-1].startswith("Exchange")
        for line in plan.splitlines()
        if "Exchange" in line and "ReusedExchange" not in line
    )
