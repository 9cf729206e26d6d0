"""Time scalar functions (SURVEY.md §2.8 F11/F12)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def travel_time_minutes(start_ts, end_ts) -> Column:
    """F12 -- (endTime - startTime) / 60000.0 in minutes
    (TravelTimePrediction.java:143)."""
    return (
        F.unix_millis(_c(end_ts)) - F.unix_millis(_c(start_ts))
    ).cast("double") / F.lit(60000.0)


def event_time(is_start, start_ts, end_ts) -> Column:
    """Per-ride event time: startTime for START events, endTime for END
    (TaxiRideSource.java:222-229)."""
    return F.when(_c(is_start), _c(start_ts)).otherwise(_c(end_ts))
