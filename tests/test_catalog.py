"""Catalog contract: every query runs at sf0.001 with a stable schema, and
every oracle is valid DuckDB SQL over the same tables. (The full value-level
differential runs via tools/check_oracle.py at sf0.01.)"""

import os

import duckdb
import pytest

from flink_training_exercises_spark.plans.catalog import CATALOG, entry_query
from flink_training_exercises_spark.schemas import TESTDATA_TABLES


@pytest.fixture(scope="module")
def duck(sf_small):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_small, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def test_entry_returns_rows(spark):
    assert entry_query(spark).count() > 0


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_query_runs(spark, sf_small, name):
    df = CATALOG[name].spark(spark, sf_small)
    assert df.columns, name
    df.limit(5).collect()


@pytest.mark.parametrize(
    "name", sorted(n for n in CATALOG if CATALOG[n].oracle is not None)
)
def test_oracle_is_valid_duckdb(duck, name):
    duck.execute(f"SELECT * FROM ({CATALOG[name].oracle}) LIMIT 5").fetchall()


def test_gate_priority_list_is_consistent():
    """_GATE_PRIORITY drives the driver's 50-entry correctness window: every
    listed name must exist, no duplicates, every registered query must be
    listed (unlisted names sort FIRST by design, but that's a safety net for
    forgotten additions, not a steady state), and both canaries plus all
    streaming gates must sit inside the window."""
    from flink_training_exercises_spark.plans.catalog import _GATE_PRIORITY, queries

    unknown = [n for n in _GATE_PRIORITY if n not in CATALOG]
    assert not unknown, f"priority list names not in CATALOG: {unknown}"
    dupes = {n for n in _GATE_PRIORITY if _GATE_PRIORITY.count(n) > 1}
    assert not dupes, f"duplicate priority entries: {dupes}"
    unlisted = [n for n in CATALOG if n not in _GATE_PRIORITY]
    assert not unlisted, f"queries missing from _GATE_PRIORITY: {unlisted}"
    window = list(queries())[:50]
    for must in [
        "canary_timestamp_schema",
        "canary_float_hash",
        "streaming_popular_places",
        "streaming_sessionize",
        "streaming_exact_dedup",
        "streaming_distinct_users",
        "streaming_travel_time_stateful",
        "streaming_interval_join",
        "streaming_interval_join_outer",
    ]:
        assert must in window, f"{must} fell outside the 50-entry gate window"
