"""Skew-mitigation rewrites preserve semantics exactly."""

from pyspark.sql import functions as F

from flink_training_exercises_spark.operators.skew import (
    salted_aggregate,
    salted_broadcast_join,
    top_keys,
)


def _skewed(spark):
    # one hot key with 90% of rows
    hot = spark.range(9000).select(F.lit("hot").alias("k"), F.col("id").alias("v"))
    cold = spark.range(1000).select(
        F.concat(F.lit("c"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    return hot.union(cold)


def test_salted_aggregate_matches_direct(spark):
    df = _skewed(spark)
    direct = {
        (r["k"]): (r["n"], r["s"])
        for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")).collect()
    }
    salted = {
        (r["k"]): (r["n"], r["s"])
        for r in salted_aggregate(df, ["k"], {"n": "count", "s": "sum:v"}).collect()
    }
    assert salted == direct


def test_salted_broadcast_join_matches_direct(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", 1), ("c1", 2), ("c2", 3)], "k2 string, tag int"
    )
    direct = big.join(small, big["k"] == small["k2"]).count()
    salted = salted_broadcast_join(big, small, "k", "k2").count()
    assert salted == direct == 9000 + 20 + 20


def test_top_keys_diagnosis(spark):
    out = top_keys(_skewed(spark), "k", n=1).first()
    assert out["k"] == "hot"
    assert out["share"] == 0.9
