"""Bucketed co-located joins: the write-time shuffle amortization."""

import uuid

from flink_training_exercises_spark.sources import load_table
from flink_training_exercises_spark.sources.bucketing import (
    bucketed_join,
    plan_has_exchange,
    write_bucketed,
)


def test_bucketed_join_is_shuffle_free(spark, sf_small):
    # warehouse dir is a static conf -- set to /tmp by session.get_spark
    suffix = uuid.uuid4().hex[:8]
    li, od = f"li_{suffix}", f"od_{suffix}"
    write_bucketed(
        load_table(spark, "lineitem", sf_small), li, "l_orderkey", 8, sort_col="l_orderkey"
    )
    write_bucketed(
        load_table(spark, "orders", sf_small).withColumnRenamed("o_orderkey", "l_orderkey"),
        od,
        "l_orderkey",
        8,
        sort_col="l_orderkey",
    )
    joined = bucketed_join(spark, li, od, "l_orderkey")

    # the whole point: no Exchange anywhere in the join plan
    assert not plan_has_exchange(joined)

    # and identical results to the plain (shuffling) join
    plain = load_table(spark, "lineitem", sf_small).join(
        load_table(spark, "orders", sf_small).withColumnRenamed("o_orderkey", "l_orderkey"),
        "l_orderkey",
    )
    assert joined.count() == plain.count() > 0

    # sanity: the same sort-merge join on raw (unbucketed) tables DOES
    # shuffle (hint on the input side forces SMJ past the tiny-SF broadcast
    # choice -- at real scale SMJ is what the bucketing removes)
    raw_smj = load_table(spark, "lineitem", sf_small).join(
        load_table(spark, "orders", sf_small)
        .withColumnRenamed("o_orderkey", "l_orderkey")
        .hint("merge"),
        "l_orderkey",
    )
    assert plan_has_exchange(raw_smj)

    spark.sql(f"DROP TABLE IF EXISTS {li}")
    spark.sql(f"DROP TABLE IF EXISTS {od}")
