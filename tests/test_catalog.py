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
    # round-12 new (staged promotions: the VERDICT r11 #2 eight --
    # text spread pair, CMS planner primitive, shard-merge completion,
    # graph mixing statistic, rational diversity twin, market-basket
    # screen, and the fifth mergeable on-stream sketch)
    "heaps_vocab_growth",
    "rake_keywords",
    "join_cardinality_estimate",
    "approx_topk_shard_union",
    "degree_assortativity",
    "user_behavior_gini",
    "session_cooccurrence_lift",
    "streaming_windowed_minhash",
    # canaries
    "canary_timestamp_schema",
    "canary_float_hash",
    # r8-evidence rotation: all 33 remaining r8 rows
    "value_histogram",
    "bloom_semijoin_orders",
    "dq_audit_relational",
    "dedup_repeated_ngrams",
    "hll_distinct_users",
    "countmin_token_freq",
    "zorder_layout_documents",
    "multimodal_resize",
    "inverted_index_postings",
    "doc_typicality_bigrams",
    "frequent_tokens_topk",
    "ann_topk_pq",
    "ann_topk_ivf_pq",
    "ann_recall_at_k",
    "ann_topk_ivf",
    "dedup_incremental_minhash",
    "multimodal_feature_extract",
    "ann_topk_bruteforce_pandas",
    "neardup_embedding_cosine_lsh",
    "text_repetition",
    "pii_scrub_mails",
    "sample_stratified_documents",
    "pack_sequences_4k",
    "mixture_expand_weighted",
    "skew_salted_event_counts",
    "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q13_order_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q17_small_quantity",
    # r9-evidence fill: the first 7 of the 48 r9 rows
    "streaming_windowed_histogram",
    "record_linkage_scores",
    "quantile_merge_shards",
    "entity_resolution_clusters",
    "props_json_profile",
    "weighted_sample",
    "bloom_contamination_screen",
]




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
