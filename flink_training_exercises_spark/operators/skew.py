"""Skew-mitigation operators for hot keys at scale.

AQE's skew-join splitting (on in session.py) covers sort-merge joins, but
two patterns still need explicit handling on a 1000-executor cluster:

  * salted two-phase aggregation -- a groupBy where one key holds a large
    fraction of all rows bottlenecks its single reducer. Phase 1 aggregates
    on (key, salt) so the hot key spreads over `salt_buckets` reducers;
    phase 2 combines the partials. Correct for any algebraic aggregate;
    exposed here for count/sum (exact integers).
  * salted broadcast-side replication join -- a join where the probe side's
    hot key floods one task: replicate the small side `salt_buckets` times
    and salt the big side uniformly.

Both are semantics-preserving rewrites; tests assert equality with the
direct forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 16


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Two-phase skew-safe aggregation. ``aggs`` maps output alias ->
    'count' | 'sum:<col>' (algebraic aggregates that re-combine exactly)."""
    salted = df.withColumn("__salt", (F.rand(seed=7) * salt_buckets).cast("int"))
    phase1_exprs = []
    phase2_exprs = []
    for alias, spec in aggs.items():
        if spec == "count":
            phase1_exprs.append(F.count(F.lit(1)).alias(f"__p_{alias}"))
            phase2_exprs.append(F.sum(f"__p_{alias}").alias(alias))
        elif spec.startswith("sum:"):
            phase1_exprs.append(F.sum(spec[4:]).alias(f"__p_{alias}"))
            phase2_exprs.append(F.sum(f"__p_{alias}").alias(alias))
        else:
            raise ValueError(f"unsupported agg spec {spec!r}")
    partial = salted.groupBy(*keys, "__salt").agg(*phase1_exprs)
    return partial.groupBy(*keys).agg(*phase2_exprs)


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Inner join where `big` has hot keys: replicate `small` over every
    salt bucket, salt `big` uniformly, equi-join on (key, salt). The hot
    key's rows land on `salt_buckets` tasks instead of one."""
    spark = big.sparkSession
    salts = spark.range(salt_buckets).select(F.col("id").cast("int").alias("__salt"))
    small_rep = small.crossJoin(F.broadcast(salts))
    big_salted = big.withColumn("__salt", (F.rand(seed=11) * salt_buckets).cast("int"))
    joined = big_salted.join(
        F.broadcast(small_rep),
        (big_salted[big_key] == small_rep[small_key])
        & (big_salted["__salt"] == small_rep["__salt"]),
    )
    return joined.drop("__salt")


def top_keys(df: DataFrame, key: str, n: int = 10) -> DataFrame:
    """Skew diagnosis: the n heaviest keys with counts and share -- run this
    before picking a mitigation."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("share", F.col("cnt") / F.lit(float(total)))
        .orderBy(F.desc("cnt"), F.asc(key))
        .limit(n)
    )
