"""Source/format tests: TaxiRide CSV quirks, mbox-style multi-char record
delimiter, edge lists."""

from flink_training_exercises_spark.sources import (
    read_edge_list,
    read_mail_records,
    read_taxi_rides_csv,
    taxi_ride_to_csv_line,
)


def test_taxi_csv_end_time_swap_and_blank_coords(spark, tmp_path):
    # TaxiRide.java:76-82: END rows print (endTime, startTime) -- swapped;
    # TaxiRide.java:119-122: blank coords parse to 0.0.
    p = tmp_path / "rides.csv"
    p.write_text(
        "1,START,2013-01-01 00:00:00,2013-01-01 00:05:00,-74.0,40.75,-73.9,40.8,2\n"
        "1,END,2013-01-01 00:05:00,2013-01-01 00:00:00,-74.0,40.75,-73.9,40.8,2\n"
        "2,START,2013-01-01 00:01:00,1970-01-01 00:00:00,,,,,1\n"
    )
    rows = {(r["rideId"], r["isStart"]): r for r in read_taxi_rides_csv(spark, str(p)).collect()}
    start, end = rows[(1, True)], rows[(1, False)]
    # both events of ride 1 agree on (startTime, endTime) after the un-swap
    assert start["startTime"] == end["startTime"]
    assert start["endTime"] == end["endTime"]
    assert start["startTime"].minute == 0 and start["endTime"].minute == 5
    blank = rows[(2, True)]
    assert blank["startLon"] == 0.0 and blank["endLat"] == 0.0


def test_taxi_csv_roundtrip(spark, tmp_path):
    p = tmp_path / "rides.csv"
    line = "7,END,2013-01-01 12:30:00,2013-01-01 12:00:00,-74.0,40.75,-73.9,40.8,3"
    p.write_text(line + "\n")
    df = read_taxi_rides_csv(spark, str(p))
    back = taxi_ride_to_csv_line(df).first()["value"]
    assert back == line


def test_mail_records_multichar_delimiters(spark, tmp_path):
    # MBoxParser.java:56-57: fields '#|#', records '##//##'.
    p = tmp_path / "mails.txt"
    recs = [
        "id1#|#2014-09-01-00:00:00#|#A <a@x>#|#subj1#|#body one#|#null",
        "id2#|#2014-09-02-00:00:00#|#B <b@x>#|#subj2#|#body two#|#id1",
    ]
    p.write_text("##//##".join(recs))
    got = {r["messageId"]: r for r in read_mail_records(spark, str(p)).collect()}
    assert set(got) == {"id1", "id2"}
    assert got["id2"]["replyTo"] == "id1"
    assert got["id1"]["sender"] == "A <a@x>"


def test_edge_list(spark, tmp_path):
    p = tmp_path / "edges.tsv"
    p.write_text("a\tb\t1.5\nb\tc\t2.0\n")
    got = {(r["src"], r["dst"]): r["weight"] for r in read_edge_list(spark, str(p)).collect()}
    assert got == {("a", "b"): 1.5, ("b", "c"): 2.0}
