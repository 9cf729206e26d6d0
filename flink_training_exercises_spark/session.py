"""SparkSession factory.

Everything in the reference runs in UTC (TaxiRide.java:42-43 formats with
``DateTimeZone.UTC``), so the session timezone is pinned to UTC -- otherwise
event-time window boundaries shift (SURVEY.md §7 watch list).

Tuned for correctness *and* scale:
  * AQE on (runtime coalescing, skew-join splitting) -- the local default,
    and exactly what a 1000-executor cluster wants too.
  * shuffle partitions sized to the local core count; on a real cluster this
    is overridden by the deploy config / AQE coalescing.
  * Arrow enabled for the pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .scratch import scratch_root

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "flink_training_exercises_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) the tuned local SparkSession."""
    n = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
        # shuffle/spill/broadcast blocks on the fastest scratch available
        # (slow-disk boxes otherwise bottleneck on local I/O -- scratch.py);
        # cluster deploys override via SPARK_LOCAL_DIRS / their own conf
        .config("spark.local.dir", scratch_root())
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
