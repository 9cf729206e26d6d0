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


# The EXACT round-5 gate window, in order (ADVICE r3: snapshot the full
# window so an insertion that silently ejects the tail fails loudly).
# Changing _GATE_PRIORITY requires updating this list in the same commit --
# that edit is the explicit record of which row was ejected and why.
EXPECTED_GATE_WINDOW = [
    # round-13 new (staged promotions: the VERDICT r12 #1 backlog-
    # clearing six -- forensic Benford + chi-squared drift screens,
    # embedding centroid drift, hashing-trick collision audit,
    # crawl-order vocab drift, and the sixth mergeable on-stream
    # sketch [Bloom/membership])
    "benford_value_audit",
    "chi_squared_independence",
    "embedding_centroid_drift",
    "feature_hashing_profile",
    "vocab_drift_halves",
    "streaming_windowed_bloom",
    # round-13 CHANGED (rake stopword cut: unpartitioned row_number
    # window -> TakeOrdered orderBy().limit, VERDICT r12 #3; output
    # identical, the new plan attested by this window row)
    "rake_keywords",
    # round-13 continuation CHANGED (structural NULL-value filter on
    # the trend/correlation family, output-identical on this NULL-free
    # testdata; value_hour_correlation regrouped up from the r9 block)
    "theil_sen_trend",
    "value_trend_ols",
    "cusum_level_shift",
    "value_hour_correlation",
    # canaries
    "canary_timestamp_schema",
    "canary_float_hash",
    # the 37 remaining r9-evidence rows (stalest; the 7 r10 fill rows
    # of the zero-additions plan were ejected by the 7 new/changed
    # rows, and the 3 tail rows by the continuation CHANGED block)
    "tokenizer_fertility",
    "streaming_scd2_maintenance",
    "cdc_merge_user_state",
    "sssp_event_graph",
    "vocab_oov_rate",
    "timeseries_gapfill_hourly",
    "dedup_editdistance_blocked",
    "hll_merge_shards",
    "scd2_point_in_time_join",
    "cube_user_type_day",
    "snapshot_diff_documents",
    "skew_salted_join_events",
    "session_path_topk",
    "zonemap_pruning_audit",
    "streaming_anomaly_zscore",
    "event_transitions_markov",
    "anomaly_rolling_zscore",
    "gopher_quality_flags",
    "segment_dedup_keepfirst",
    "chunk_sliding_windows",
    "split_leakage_neardup",
    "funnel_user_stages",
    "retention_cohorts",
    "streaming_enrich_static",
    "bpe_encode_corpus",
    "incremental_corpus_roundtrip",
    "dedup_clusters_minhash",
    "dedup_keep_best",
    "embedding_dedup_clusters",
    "kcore_interactions",
    "streaming_cdc_merge",
    "shuffle_shard_layout",
    "sessionize_events",
    "dedup_simhash",
    "tpch_q1_pricing_summary",
    "pagerank_weighted",
    "travel_time_prediction",
]
# (mail_tfidf, reply_graph, member_of_the_month -- ejected by the
# continuation CHANGED block; they lead the round-14 rotation)




def test_headline_v2_proposal_names_resolve():
    """The proposed v2 headline basket (bench.py, VERDICT r3 #7) must name
    real catalog queries and must NOT change the active basket: the
    bench=True flags stay the round-1 twelve."""
    import bench

    missing = [n for n in bench.HEADLINE_V2_PROPOSAL if n not in CATALOG]
    assert not missing, missing
    active = sorted(n for n in CATALOG if CATALOG[n].bench)
    assert active == sorted(
        [
            "ride_cleansing",
            "popular_places",
            "mail_count",
            "reply_graph",
            "mail_tfidf",
            "pagerank_weighted",
            "travel_time_prediction",
            "dedup_minhash_lsh",
            "ann_topk_bruteforce",
            "sessionize_events",
            "tpch_q1_pricing_summary",
            "tpch_q5_local_supplier",
        ]
    )


def test_gate_priority_list_is_consistent():
    """_GATE_PRIORITY drives the driver's 50-entry correctness window: every
    listed name must exist, no duplicates, every registered query must be
    listed (unlisted names sort FIRST by design, but that's a safety net for
    forgotten additions, not a steady state), and the window must match the
    EXPECTED_GATE_WINDOW snapshot exactly -- including order."""
    from flink_training_exercises_spark.plans.catalog import _GATE_PRIORITY, queries

    unknown = [n for n in _GATE_PRIORITY if n not in CATALOG]
    assert not unknown, f"priority list names not in CATALOG: {unknown}"
    dupes = {n for n in _GATE_PRIORITY if _GATE_PRIORITY.count(n) > 1}
    assert not dupes, f"duplicate priority entries: {dupes}"
    unlisted = [n for n in CATALOG if n not in _GATE_PRIORITY]
    assert not unlisted, f"queries missing from _GATE_PRIORITY: {unlisted}"
    assert len(EXPECTED_GATE_WINDOW) == 50
    window = list(queries())[:50]
    assert window == EXPECTED_GATE_WINDOW, (
        "gate window drifted from snapshot; "
        f"ejected={sorted(set(EXPECTED_GATE_WINDOW) - set(window))} "
        f"entered={sorted(set(window) - set(EXPECTED_GATE_WINDOW))}"
    )


def test_no_stacked_registrations():
    """Two catalog names bound to the same builder function = a @register
    block inserted between another entry's decorator and its def (the
    value_histogram/value_outliers_mad round-4 bug: both names silently
    served the histogram). Every registered name must own a distinct
    function."""
    fns = [spec.spark for spec in CATALOG.values()]
    dupes = {f.__name__ for f in fns if fns.count(f) > 1}
    assert not dupes, f"stacked @register decorators on: {dupes}"


def test_evidence_ages_tool_runs_clean():
    """tools/evidence_ages.py: every query's LATEST driver row must be
    green (exit 0), and its never-gated set must be exactly the catalog
    entries the driver has not yet seen (i.e. the current round's new
    queries, all inside the gate window so they get their first row)."""
    import subprocess
    import sys

    from flink_training_exercises_spark.plans.catalog import queries

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, os.path.join(repo_root, "tools", "evidence_ages.py")],
        capture_output=True,
        text=True,
        cwd=repo_root,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    never = {
        line.split()[1]
        for line in res.stdout.splitlines()
        if line.strip().startswith("never")
    }
    window = set(list(queries())[:50])
    assert never <= window, (
        f"never-gated queries outside the gate window (would stay "
        f"evidence-less after this round): {sorted(never - window)}"
    )
