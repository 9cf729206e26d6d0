"""Bucketized range join: inclusive bounds, bucket-boundary spanning,
left-join semantics."""

from flink_training_exercises_spark.operators.rangejoin import range_join_bucketed


def test_range_join_semantics(spark):
    points = spark.createDataFrame(
        [(1, 100), (2, 150), (3, 200), (4, 999), (5, 1000), (6, 1500)],
        "pid long, t bigint",
    )
    # interval spans multiple buckets (width 100); bounds inclusive
    intervals = spark.createDataFrame(
        [(10, 100, 1000), (20, 1400, 1450)], "iid long, s bigint, e bigint"
    )
    got = {
        (r["pid"], r["iid"])
        for r in range_join_bucketed(points, intervals, "t", "s", "e", 100).collect()
    }
    # 100 and 1000 are inclusive endpoints; 1500 is outside interval 20
    assert got == {(1, 10), (2, 10), (3, 10), (4, 10), (5, 10)}


def test_range_join_left_keeps_unmatched(spark):
    points = spark.createDataFrame([(1, 50), (2, 250)], "pid long, t bigint")
    intervals = spark.createDataFrame([(10, 200, 300)], "iid long, s bigint, e bigint")
    rows = {
        r["pid"]: r["iid"]
        for r in range_join_bucketed(
            points, intervals, "t", "s", "e", 100, how="left"
        ).collect()
    }
    assert rows == {1: None, 2: 10}


def test_range_join_left_null_point_columns_not_duplicated(spark):
    """Advisor-flagged regression: a matched point carrying a NULL in some
    other column must appear exactly once, not re-emitted as unmatched (the
    old anti-join reconstruction used non-null-safe equality)."""
    points = spark.createDataFrame(
        [(1, 250, None), (2, 50, "x")], "pid long, t bigint, tag string"
    )
    intervals = spark.createDataFrame([(10, 200, 300)], "iid long, s bigint, e bigint")
    out = range_join_bucketed(points, intervals, "t", "s", "e", 100, how="left").collect()
    assert len(out) == 2
    rows = {r["pid"]: r["iid"] for r in out}
    assert rows == {1: 10, 2: None}


def test_range_join_rejects_shared_column_names(spark):
    import pytest

    points = spark.createDataFrame([(1, 50)], "pid long, t bigint")
    intervals = spark.createDataFrame([(10, 200, 300)], "pid long, s bigint, e bigint")
    with pytest.raises(ValueError, match="disjoint"):
        range_join_bucketed(points, intervals, "t", "s", "e", 100)
