"""Time scalar functions (SURVEY.md §2.8 F11/F12)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def ntz_epoch() -> Column:
    """TIMESTAMP_NTZ '1970-01-01 00:00:00' (lazy: F.expr needs a session)."""
    return F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'")


def epoch_ms(ts) -> Column:
    """Epoch milliseconds of a TIMESTAMP_NTZ column -- bit-identical to
    DuckDB's ``epoch_ms(ts)`` on naive timestamps, independent of the
    Spark session timezone (unlike ``unix_millis`` on LTZ timestamps)."""
    return F.timestamp_diff("MILLISECOND", ntz_epoch(), _c(ts))


def epoch_us(ts) -> Column:
    """Epoch MICROseconds of a TIMESTAMP_NTZ column -- the full resolution
    of the testdata's timestamp[us]; bit-identical to DuckDB's
    ``epoch_us(ts)`` on naive timestamps and session-TZ independent. Use it
    as the ORDERING key wherever the oracle orders by raw ``ts``:
    millisecond-truncated epoch_ms ties where full timestamps do not (the
    streaming-SCD2 review catch), the same latent-divergence class as the
    r3 per-side-truncation fact."""
    return F.timestamp_diff("MICROSECOND", ntz_epoch(), _c(ts))


def ntz_as_utc_instant(ts) -> Column:
    """TIMESTAMP_NTZ -> TIMESTAMP (LTZ) carrying the same wall-clock read as
    a UTC instant, via pure epoch arithmetic -- independent of the session
    timezone (a plain cast would shift by the session offset). Needed because
    ``withWatermark`` only accepts TIMESTAMP event-time columns."""
    return F.timestamp_micros(F.timestamp_diff("MICROSECOND", ntz_epoch(), _c(ts)))


def travel_time_minutes(start_ts, end_ts) -> Column:
    """F12 -- (endTime - startTime) / 60000.0 in minutes
    (TravelTimePrediction.java:143)."""
    return F.timestamp_diff("MILLISECOND", _c(start_ts), _c(end_ts)).cast("double") / F.lit(
        60000.0
    )


def event_time(is_start, start_ts, end_ts) -> Column:
    """Per-ride event time: startTime for START events, endTime for END
    (TaxiRideSource.java:222-229)."""
    return F.when(_c(is_start), _c(start_ts)).otherwise(_c(end_ts))
