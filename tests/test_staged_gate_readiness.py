"""Gate-readiness audit for STAGED (not-yet-registered) operators: one
consolidated check that each staged op's Spark output matches its DuckDB
twin in VALUES, COLUMN NAMES, and PANDAS DTYPES -- the three things the
driver's correctness gate hashes. The per-op differential tests compare
python values, where ``1 == 1.0``; this is the test that catches an
int-vs-float dtype skew (the gate-killer class) BEFORE registration.

Registration rule: a staged op may be promoted to the catalog only
while its row here is green; new staged ops add a case to CASES.
Promoted ops leave this file in the same commit chain (their parity is
then the driver gate's job via check_oracle/CORRECTNESS): the five
round-7 promotions (sorted_neighborhood, prefix_filter_jaccard,
concurrency_profile, kanonymity_profile, streaming_windowed_topk), the
five round-8 promotions (hilbert_pruning_audit, streaming_windowed_hll,
streaming_concurrency_profile, pii_tcloseness_audit
[t_closeness_audit], personalized_pagerank), the eight round-9
promotions (streaming_windowed_histogram, record_linkage_scores,
quantile_merge_shards, entity_resolution_clusters, props_json_profile,
weighted_sample, bloom_contamination_screen, tokenizer_fertility), and
the eleven round-10 promotions (streaming_windowed_quantile,
index_staleness_audit, skew_profile, quota_sample,
temporal_reachability, source_scorecard, hll_intersection_estimate,
random_walks, plus the three oldest staged ops value_trend_ols,
cusum_level_shift, contrastive_negatives), and the eight round-11
promotions (streaming_windowed_cms, k_truss_edges,
bloom_skipping_audit, clustering_coefficients,
edge_jaccard_similarity, theil_sen_trend, downsample_lttb,
attribution_credit), and the eight round-12 promotions
(heaps_vocab_growth, rake_keywords, join_cardinality_estimate,
approx_topk_shard_union, degree_assortativity, user_behavior_gini,
session_cooccurrence_lift, streaming_windowed_minhash), and the six
round-13 promotions (benford_value_audit, chi_squared_independence,
embedding_centroid_drift, feature_hashing_profile, vocab_drift_halves,
streaming_windowed_bloom -- the backlog-clearing rotation VERDICT r12
#1 recorded) were trimmed when they entered the catalog. The round-13
trim emptied BOTH lists; the batch list was refilled the same round
with four round-13 stagings (ks_two_sample_drift, value_acf_lags,
mann_kendall_trend, rfm_segments); the streaming list stays empty
until a new streaming op is staged."""

import duckdb
import pytest

from flink_training_exercises_spark.sources import load_table


def _cases(spark, sf):
    """Staged BATCH cases: operator DataFrame paired with its DuckDB
    twin SQL, keyed by the operator function's name (the label-parity
    test's convention). Refilled after the round-13 backlog-clearing
    promotion with four round-13 stagings: the exact-rational KS
    two-sample drift screen, the ACF lag screen, the Mann-Kendall
    trend test, and RFM quantile segmentation."""
    from flink_training_exercises_spark.operators.sessions import (
        rfm_segments,
        rfm_segments_sql,
    )
    from flink_training_exercises_spark.operators.timeseries import (
        ks_two_sample_drift,
        ks_two_sample_drift_sql,
        mann_kendall_trend,
        mann_kendall_trend_sql,
        value_acf_lags,
        value_acf_lags_sql,
    )

    ev = load_table(spark, "events", sf)
    return {
        "ks_two_sample_drift": (
            ks_two_sample_drift(ev),
            ks_two_sample_drift_sql(),
        ),
        "value_acf_lags": (
            value_acf_lags(ev),
            value_acf_lags_sql(),
        ),
        "mann_kendall_trend": (
            mann_kendall_trend(ev),
            mann_kendall_trend_sql(),
        ),
        "rfm_segments": (
            rfm_segments(ev),
            rfm_segments_sql(),
        ),
    }


def streaming_cases(spark, sf):
    """Staged STREAMING cases: the run_* availableNow wrappers (the
    exact callables a future @register will use) paired with their
    DuckDB oracles. Shared by the streaming readiness test and
    tools/hostile_staged_probe.py. EMPTY since the round-13 promotion
    of streaming_windowed_bloom emptied the list for the SIXTH time
    (backlog = 0); the skip branch below is live until a new streaming
    op is staged."""
    return {}


def compare_cases(con, cases, verbose: bool = False) -> list[str]:
    """The ONE parity routine (values, column names, pandas dtypes --
    exactly what the driver gate hashes) shared by both readiness tests
    and tools/hostile_staged_probe.py; change the bar here and every
    caller inherits it."""
    failures = []
    for name, (sdf, sql) in cases.items():
        sp = sdf.toPandas()
        du = con.execute(sql).df()
        if sorted(sp.columns) != sorted(du.columns):
            failures.append(
                f"{name}: columns {list(sp.columns)} vs {list(du.columns)}"
            )
            continue
        du = du[list(sp.columns)]
        skew = {
            c: (str(sp[c].dtype), str(du[c].dtype))
            for c in sp.columns
            if str(sp[c].dtype) != str(du[c].dtype)
        }
        if skew:
            failures.append(f"{name}: dtype skew {skew}")

        def _norm(t):
            # NULL-safe compare: a NULL output cell reaches pandas as NaN
            # and NaN != NaN, so two bit-identical nullable columns would
            # read as a value mismatch (first hit: streaming_scd2's open
            # rows). Map NaN -> None on BOTH sides; None is a singleton,
            # so tuple equality is exact again. repr sort key keeps the
            # ordering total over mixed None/number columns. The driver's
            # own hash compare is NULL-tolerant the same way (the batch
            # scd2_user_history gate row has been green since r3).
            # KNOWN CONFLATION: a genuine float NaN value also maps to
            # None, so a Spark-NaN vs DuckDB-NULL divergence would pass
            # this gate -- acceptable only because raw float outputs are
            # banned repo-wide (README determinism rule 3: floats appear
            # only as final deterministic functions of exact integers,
            # never NaN-able aggregates); don't stage an op that violates
            # that rule expecting this audit to catch it.
            return tuple(
                None if (v is None or v != v) else v for v in t
            )

        sv = sorted(map(_norm, sp.itertuples(index=False)), key=repr)
        dv = sorted(map(_norm, du.itertuples(index=False)), key=repr)
        if sv != dv:
            failures.append(f"{name}: {len(sv)} vs {len(dv)} rows / value mismatch")
        elif not sv:
            failures.append(f"{name}: empty result")
        elif verbose:
            print(f"OK    {name}: {len(sv)} rows match")
    return failures


def test_staged_ops_gate_ready(spark, sf_small):
    cases = _cases(spark, sf_small)
    if not cases:
        pytest.skip("no staged batch ops (all promoted)")
    con = duckdb.connect()
    for t in ("documents", "events", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_small}/{t}.parquet'"
        )
    failures = compare_cases(con, cases)
    assert not failures, "\n".join(failures)


def test_staged_streaming_ops_gate_ready(spark, sf_small):
    """Gate-readiness for staged STREAMING ops via the shared case list
    and parity routine."""
    cases = streaming_cases(spark, sf_small)
    if not cases:
        pytest.skip("no staged streaming ops (all promoted)")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_small}/events.parquet'"
    )
    failures = compare_cases(con, cases)
    assert not failures, "\n".join(failures)


def test_staged_labels_match_readiness_cases():
    """Structural guard against the round-11 trim trap (a CASES cleanup
    regex swallowed two NON-promoted neighbors, silently dropping their
    readiness + hostile-probe coverage): the set of package functions
    whose docstring carries the 'STAGED (gate-ready' label must equal
    the union of batch + streaming readiness case keys, in BOTH
    directions -- a staged op without a case has lost its promotion
    gate, and a case without a label is either promoted-but-not-trimmed
    or missing its convention label. Case keys are parsed from THIS
    file's source (the dict-entry convention `"name": (`), so the guard
    costs no Spark work; by the same convention every case key equals
    the operator function's name."""
    import pathlib
    import re

    label = "STAGED (gate-ready"
    labeled = set()
    pkg = pathlib.Path(__file__).resolve().parents[1] / "flink_training_exercises_spark"
    for p in pkg.rglob("*.py"):
        text = p.read_text()
        for m in re.finditer(re.escape(label), text):
            defs = re.findall(r"^def ([a-z0-9_]+)\(", text[: m.start()], re.M)
            assert defs, f"{p}: label outside any function"
            labeled.add(defs[-1])
    here = pathlib.Path(__file__).read_text()
    keys = set(re.findall(r'^        "([a-z0-9_]+)": \(', here, re.M))
    # With a cleared backlog both sides are legitimately empty; the
    # parse-failure guard only has teeth while labels exist.
    assert keys or not labeled, (
        "case-key parse found nothing while staged labels exist -- "
        "indentation convention changed?"
    )
    assert labeled == keys, (
        f"labeled-but-no-readiness-case: {sorted(labeled - keys)}; "
        f"case-but-no-label: {sorted(keys - labeled)}"
    )
