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
