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


def _reference_cells_on_way(lon1, lat1, lon2, lat2):
    """Python port of the reference walk (GeoUtils.java:106-161), including
    its asymmetric negative-slope branch (corner case falls through to a
    second test against the updated row) -- the parity ground truth."""
    import math

    from flink_training_exercises_spark.functions.geo import (
        DELTA_LAT,
        DELTA_LON,
        LAT_NORTH,
        LON_WEST,
        NUMBER_OF_GRID_X,
    )

    x1 = math.floor((abs(LON_WEST) - abs(lon1)) / DELTA_LON)
    y1 = math.floor((LAT_NORTH - lat1) / DELTA_LAT)
    x2 = math.floor((abs(LON_WEST) - abs(lon2)) / DELTA_LON)
    y2 = math.floor((LAT_NORTH - lat2) / DELTA_LAT)
    if x1 <= x2:
        sx, sy, ex, ey = x1, y1, x2, y2
    else:
        sx, sy, ex, ey = x2, y2, x1, y1
    slope = (ey - sy) / ((ex - sx) + 0.00000001)
    cx, cy = sx, sy
    cells = [cx + cy * NUMBER_OF_GRID_X]
    while cx < ex or cy != ey:
        if slope > 0:
            y = (cx - sx + 0.5) * slope + sy - 0.5
            if cy - 0.05 < y < cy + 0.05:
                cx += 1
                cy += 1
            elif y < cy:
                cx += 1
            else:
                cy += 1
        else:
            y = (cx - sx + 0.5) * slope + sy + 0.5
            if cy - 0.05 < y < cy + 0.05:
                cx += 1
                cy -= 1
            if y > cy:  # NOT elif: evaluated against the updated cy
                cx += 1
            else:
                cy -= 1
        cells.append(cx + cy * NUMBER_OF_GRID_X)
    return cells


def test_grid_cells_on_way_matches_reference_walk(spark):
    """Exact parity with the reference edge walk over a deterministic sweep
    of NYC segment geometries (all slope signs, verticals, horizontals,
    corner-touch diagonals, same-cell)."""
    pts = []
    for i in range(40):
        lon1 = -74.04 + (i * 7 % 23) * 0.0141
        lat1 = 40.52 + (i * 11 % 19) * 0.0247
        lon2 = -74.04 + (i * 13 % 23) * 0.0141
        lat2 = 40.52 + (i * 17 % 19) * 0.0247
        pts.append((i, lon1, lat1, lon2, lat2))
    # degenerate + exact-diagonal cases
    pts += [
        (100, -74.0, 40.75, -74.0, 40.75),          # same point
        (101, -74.0, 40.75, -74.0, 40.80),          # vertical
        (102, -74.0, 40.75, -73.95, 40.75),         # horizontal
        (103, -74.0, 40.75, -74.0 + 10 * 0.0014, 40.75 - 10 * 0.00125),  # diag down
        (104, -74.0, 40.75, -74.0 + 10 * 0.0014, 40.75 + 10 * 0.00125),  # diag up
    ]
    df = spark.createDataFrame(
        pts, "id long, lon1 double, lat1 double, lon2 double, lat2 double"
    )
    got = {
        r["id"]: list(r["cells"])
        for r in df.select(
            "id", grid_cells_on_way("lon1", "lat1", "lon2", "lat2").alias("cells")
        ).collect()
    }
    for i, lon1, lat1, lon2, lat2 in pts:
        assert got[i] == _reference_cells_on_way(lon1, lat1, lon2, lat2), i


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
