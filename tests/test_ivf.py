"""IVF ANN: determinism of the exact k-means and recall sanity vs brute
force."""

from pyspark.sql import functions as F

from flink_training_exercises_spark.operators.ivf import ivf_topk, kmeans_assignments
from flink_training_exercises_spark.operators.similarity import topk_bruteforce
from flink_training_exercises_spark.sources import load_table


def test_kmeans_is_deterministic(spark, sf_small):
    emb = load_table(spark, "embeddings", sf_small)
    a1, c1 = kmeans_assignments(emb)
    a2, c2 = kmeans_assignments(emb)
    assert {(r["cid"], tuple(r["c"])) for r in c1.collect()} == {
        (r["cid"], tuple(r["c"])) for r in c2.collect()
    }
    assert {(r["id"], r["cid"]) for r in a1.collect()} == {
        (r["id"], r["cid"]) for r in a2.collect()
    }


def test_kmeans_partitions_corpus(spark, sf_small):
    emb = load_table(spark, "embeddings", sf_small)
    assigned, cents = kmeans_assignments(emb)
    n = emb.count()
    assert assigned.count() == n  # every vector in exactly one bucket
    assert assigned.select("cid").distinct().count() <= 8
    assert cents.count() == 8


def test_ivf_recall_vs_bruteforce(spark, sf_small):
    emb = load_table(spark, "embeddings", sf_small)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in topk_bruteforce(emb, k=5, query_filter=F.col("vec_id") % 25 == 0).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"]) for r in ivf_topk(emb).collect()
    }
    # IVF is approximate; with random embeddings and nprobe=2/8 buckets,
    # expect meaningful-but-partial recall. Row count can legitimately dip
    # below the exact count when a query's probed buckets hold <5 candidates.
    assert len(exact) == 100
    assert 0 < len(approx) <= len(exact)
    recall = len(exact & approx) / len(exact)
    assert recall > 0.1, f"recall collapsed: {recall}"


def test_index_search_prunes_partitions(spark, sf_small, tmp_path):
    """Persisted IVF index: search results equal the in-memory ivf_topk, and
    the candidate scan partition-prunes to the probed cids (file listing
    shows cid=N directories only for probed buckets)."""
    from flink_training_exercises_spark.operators.ivf import (
        NPROBE,
        _with_int_vec,
        build_ivf_index,
        search_ivf_index,
    )

    emb = load_table(spark, "embeddings", sf_small)
    path = str(tmp_path / "ivf_index")
    cents = build_ivf_index(emb, path)

    base = _with_int_vec(emb, "vec_id", "embedding")
    queries = base.where(F.col("id") % 25 == 0).select(
        F.col("id").alias("qid"), F.col("v").alias("qv"), F.col("nn").alias("qnn")
    )
    got = search_ivf_index(spark, path, cents, queries)
    expect = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in __import__(
            "flink_training_exercises_spark.operators.ivf", fromlist=["ivf_topk"]
        ).ivf_topk(emb).collect()
    }
    assert {(r["query_id"], r["neighbor_id"], r["rank"]) for r in got.collect()} == expect

    # pruning evidence on the SEARCH PATH itself: the static probed-cid
    # isin filter must reach the index scan's PartitionFilters (pruned at
    # file listing, not post-scan -- ADVICE r3: the old test only checked a
    # hand-written cid==0 predicate, not the join path)
    plan = got._jdf.queryExecution().executedPlan().toString()
    scan_filters = plan.split("PartitionFilters", 1)
    assert len(scan_filters) == 2 and "cid" in scan_filters[1][:300]
    assert "cid IN" in plan or "cid#" in scan_filters[1][:300]


def test_pq_recall_and_determinism(spark, sf_small):
    """PQ-ADC is approximate: recall@5 vs exact brute force must be
    meaningful (codebooks trained on the real sample), and two runs must
    return identical rows (driver-side Lloyd + exact arithmetic)."""
    from flink_training_exercises_spark.operators.ivf import pq_topk

    emb = load_table(spark, "embeddings", sf_small)
    r1 = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in pq_topk(emb).collect()}
    r2 = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in pq_topk(emb).collect()}
    assert r1 == r2 and len(r1) == 100
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in topk_bruteforce(emb, k=5, query_filter=F.col("vec_id") % 25 == 0).collect()
    }
    approx = {(q, n) for q, n, _ in r1}
    recall = len(exact & approx) / len(exact)
    assert recall > 0.1, f"PQ recall collapsed: {recall}"


def test_ivf_pq_composition_sane(spark, sf_small):
    """Composed IVF-PQ: deterministic, bounded to probed buckets (every
    neighbor must share one of the query's nprobe buckets), nonzero
    recall vs brute force."""
    from flink_training_exercises_spark.operators.ivf import ivf_pq_topk

    emb = load_table(spark, "embeddings", sf_small)
    r1 = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in ivf_pq_topk(emb).collect()}
    r2 = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in ivf_pq_topk(emb).collect()}
    assert r1 == r2 and 0 < len(r1) <= 100
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in topk_bruteforce(emb, k=5, query_filter=F.col("vec_id") % 25 == 0).collect()
    }
    approx = {(q, n) for q, n, _ in r1}
    assert len(exact & approx) / len(exact) > 0.05


def test_index_staleness_audit_matches_composed_oracle(spark, sf_small):
    """STAGED (round-8 backlog): the stale-vs-fresh quantizer recall audit
    must match the CTE composition of the ivf oracle (train restricted to
    the standing corpus via train_where) + the brute-force oracle."""
    import duckdb

    from flink_training_exercises_spark.operators.ivf import (
        index_staleness_audit,
        index_staleness_audit_sql,
    )
    from flink_training_exercises_spark.plans.catalog import CATALOG
    from flink_training_exercises_spark.sources import load_table

    emb = load_table(spark, "embeddings", sf_small)
    got = sorted(map(tuple, index_staleness_audit(emb).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_small}/embeddings.parquet'"
    )
    sql = index_staleness_audit_sql(CATALOG["ann_topk_bruteforce"].oracle)
    want = sorted(con.execute(sql).fetchall())
    assert got == want and len(got) == 2
    hits = {m: h for m, h, _ in got}
    total = got[0][2]
    # both estimators found something, neither exceeds ground truth
    assert 0 < hits["stale"] <= total and 0 < hits["fresh"] <= total
