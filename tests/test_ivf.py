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
