"""Travel-time prediction: hand-computed regression + form parity."""

from datetime import datetime, timedelta

from flink_training_exercises_spark.operators.stateful import (
    travel_time_stateful,
    travel_time_window,
)
from flink_training_exercises_spark.plans.rides import rides_view

RIDE_SCHEMA = (
    "ride_id long, is_start boolean, ts timestamp_ntz, "
    "start_time timestamp_ntz, end_time timestamp_ntz, "
    "start_lon double, start_lat double, end_lon double, end_lat double, "
    "passenger_cnt int"
)


def _ride_pair(rid, start_min, dur_min, s=(-74.0, 40.75), e=(-73.95, 40.78)):
    t0 = datetime(2024, 1, 1, 0, 0, 0) + timedelta(minutes=start_min)
    t1 = t0 + timedelta(minutes=dur_min)
    return [
        (rid, True, t0, t0, t1, s[0], s[1], e[0], e[1], 1),
        (rid, False, t1, t0, t1, s[0], s[1], e[0], e[1], 1),
    ]


def test_untrained_predicts_minus_one(spark):
    # First START in a (cell, bucket) has no END history -> -1
    # (TravelTimePredictionModel.java:59-64).
    df = spark.createDataFrame(_ride_pair(1, 0, 10), RIDE_SCHEMA)
    got = {r["ride_id"]: r["predicted_minutes"] for r in travel_time_window(df).collect()}
    assert got == {1: -1}


def test_prediction_after_training(spark):
    # Ride 1 (00:00-00:10) trains the bucket; ride 2 departs later on the
    # same route -> predicted ~10 min (exact 9 with integer-floored stats).
    rows = _ride_pair(1, 0, 10) + _ride_pair(2, 30, 99)
    df = spark.createDataFrame(rows, RIDE_SCHEMA)
    got = {r["ride_id"]: r["predicted_minutes"] for r in travel_time_window(df).collect()}
    assert got[1] == -1
    assert got[2] in (9, 10)  # slope*x/60000 floors; same route => ~duration of ride 1
    # END of ride 2 (99 min) arrives after ride 2's START: must NOT leak in.
    assert got[2] < 90


def test_window_and_stateful_forms_identical(spark, sf_small):
    rides = rides_view(spark, sf_small)
    w = {(r["ride_id"], r["predicted_minutes"]) for r in travel_time_window(rides).collect()}
    s = {(r["ride_id"], r["predicted_minutes"]) for r in travel_time_stateful(rides).collect()}
    assert w == s
    assert len(w) > 100  # real coverage, not an empty intersection
