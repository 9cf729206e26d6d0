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


def write_partitioned(df: DataFrame, path: str, partition_col: str) -> None:
    """Persist with directory partitioning on ``partition_col`` -- the
    layout that turns partition-key predicates (static or runtime) into
    skipped directories instead of scanned-and-filtered rows."""
    df.write.partitionBy(partition_col).mode("overwrite").parquet(path)


def dpp_join_agg(
    spark: SparkSession,
    fact_path: str,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
) -> DataFrame:
    """Join a directory-partitioned fact against a filtered dimension on
    the partition column and aggregate per key -- the star-schema shape
    Dynamic Partition Pruning exists for: Catalyst plans the dim's filter
    as BOTH an inferred static PartitionFilter and a
    ``dynamicpruningexpression`` (the broadcast's key set reused as a
    runtime IN filter on the fact scan), so the fact side reads ONLY the
    surviving partition directories. At 100 TB this is the difference
    between scanning 5 TB and 100 TB for a 5%-selective dim filter --
    tests/test_bucketing.py asserts the pruning expression is in the plan.
    """
    from pyspark.sql import functions as F

    fact = spark.read.parquet(fact_path)
    return (
        fact.join(dim, fact[fact_key] == dim[dim_key])
        .groupBy(fact_key)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
        )
    )


def plan_has_dynamic_pruning(df: DataFrame) -> bool:
    """True if the executed plan contains a DPP runtime filter on a scan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "dynamicpruning" in plan
