"""Prep tooling (P11 mbox parse, S11 trip conversion), F7/F8 geo extras,
and the SQL frontend parity."""

from datetime import datetime

from pyspark.sql import functions as F

from flink_training_exercises_spark.functions.geo import (
    grid_cell,
    grid_cells_on_way,
    random_nyc_point,
    is_in_nyc,
)
from flink_training_exercises_spark.operators.relational import member_of_the_month
from flink_training_exercises_spark.operators.tpch import pricing_summary
from flink_training_exercises_spark.plans.mails import mails_view
from flink_training_exercises_spark.plans.sql_frontend import (
    member_otm_via_sql,
    pricing_summary_via_sql,
)
from flink_training_exercises_spark.sources import load_table
from flink_training_exercises_spark.sources.prep import parse_mbox_mails, trips_to_events

RAW_MAIL = """Message-ID: <abc@x>
Date: Wed Sep 17 14:53:05 2014
From: Fabian Hueske <fhueske@apache.org>
Subject: Re: splitting DataSet
In-Reply-To: <prev@x>

Hi,
this is the =
body text.
"""

RAW_MAIL_NO_REPLY = """Message-ID: <def@x>
Date: Thu Sep 18 09:00:00 2014
From: A <a@x>
Subject: hello

body
"""

RAW_MAIL_BROKEN = """From: nobody
Subject: missing id and date

x
"""


def test_parse_mbox_mails(spark):
    raw = spark.createDataFrame(
        [(RAW_MAIL,), (RAW_MAIL_NO_REPLY,), (RAW_MAIL_BROKEN,)], "value string"
    )
    got = {r["messageId"]: r for r in parse_mbox_mails(raw).collect()}
    assert set(got) == {"<abc@x>", "<def@x>"}  # broken mail dropped
    m = got["<abc@x>"]
    assert m["time"] == "2014-09-17-14:53:05"  # date reformat (MBoxParser.java:137)
    assert m["sender"] == "Fabian Hueske <fhueske@apache.org>"
    assert m["replyTo"] == "<prev@x>"
    assert "this is the body text." in m["body"]  # '=' soft-wrap unwrapped
    assert got["<def@x>"]["replyTo"] == "null"  # sentinel (MBoxParser.java:150)


def test_trips_to_events(spark):
    trips = spark.createDataFrame(
        [
            (1, datetime(2013, 1, 1, 0, 0), datetime(2013, 1, 1, 0, 10),
             -74.0, 40.75, -73.9, 40.8, 2),
            (2, datetime(2013, 1, 1, 0, 5), datetime(2013, 1, 1, 0, 7),
             -74.0, 40.75, -73.9, 40.8, 1),
        ],
        "ride_id long, start_time timestamp_ntz, end_time timestamp_ntz, "
        "start_lon double, start_lat double, end_lon double, end_lat double, "
        "passenger_cnt int",
    )
    out = trips_to_events(trips).collect()
    assert len(out) == 4  # one START + one END per trip (convertTrips.sh:19)
    # globally ordered by event time: start1(0:00), start2(0:05), end2(0:07), end1(0:10)
    assert [(r["ride_id"], r["is_start"]) for r in out] == [
        (1, True), (2, True), (2, False), (1, False),
    ]
    assert out[0]["ts"] == out[0]["start_time"]
    assert out[3]["ts"] == out[3]["end_time"]


def test_grid_cells_on_way(spark):
    row = (
        spark.range(1)
        .select(
            grid_cells_on_way(
                F.lit(-74.0), F.lit(40.75), F.lit(-74.0 + 5 * 0.0014), F.lit(40.75)
            ).alias("cells"),
            grid_cell(F.lit(-74.0), F.lit(40.75)).alias("a"),
            grid_cell(F.lit(-74.0 + 5 * 0.0014), F.lit(40.75)).alias("b"),
        )
        .first()
    )
    # horizontal path 5 cells east: endpoint cells included, contiguous
    assert row["cells"][0] == row["a"]
    assert row["cells"][-1] == row["b"]
    assert len(row["cells"]) == 6


def test_random_nyc_point_in_bbox(spark):
    lon, lat = random_nyc_point(seed=7)
    df = spark.range(200).select(lon.alias("lon"), lat.alias("lat"))
    assert df.where(~is_in_nyc("lon", "lat")).count() == 0


def test_sql_frontend_matches_dataframe(spark, sf_small):
    sql_rows = {
        tuple(r) for r in pricing_summary_via_sql(spark, sf_small).collect()
    }
    df_rows = {
        tuple(r)
        for r in pricing_summary(load_table(spark, "lineitem", sf_small)).collect()
    }
    assert sql_rows == df_rows and len(df_rows) > 0

    sql_m = {tuple(r) for r in member_otm_via_sql(spark, sf_small).collect()}
    df_m = {tuple(r) for r in member_of_the_month(mails_view(spark, sf_small)).collect()}
    assert sql_m == df_m and len(df_m) > 0
