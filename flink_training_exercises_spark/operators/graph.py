"""Graph operators (SURVEY.md §2.7 G1-G4): weighted PageRank as a
fixed-iteration DataFrame loop.

The reference is Gelly's vertex-centric PageRank over transition
probabilities weight/sum(out-weights) (PageRankWithEdgeWeights.java:77-104).
Catalyst has no iteration operator, so the loop lives on the driver; each
step is one join + one aggregation over the *invariant* transition table,
which is computed once and cached. Follows the Java semantics (true
out-weight sums); the Scala twin's divergences (first-edge-value instead of
sum, hardcoded 2 iterations -- SURVEY.md §2.4 A9) are deliberately NOT
reproduced.

Two arithmetic modes:
  * float (default): rank/prob doubles -- the natural form.
  * exact: ranks as BIGINT in 1e-12 units with floor-div transition math.
    Integer sums are associative-exact, so results are bit-identical across
    engines and partitionings -- this is what the DuckDB oracle checks, and
    it also makes the operator's output stable under AQE re-partitioning.

Scale notes: the transition table and the vertex set are iteration
invariants, so both are hash-repartitioned on their join key ONCE (same
partition count) and cached; every per-iteration join then reads an
already-co-partitioned side and the only recurring shuffle is the
groupBy(dst) contribution aggregation -- the data movement PageRank
inherently requires (1 exchange/iteration instead of 2). The rank state
itself exits each iteration partitioned by vertex, so it re-enters the
next join exchange-free as well. ``checkpoint_every`` truncates lineage
for long loops (localCheckpoint -- no HDFS needed, and it preserves the
partitioning); at cluster scale use a real checkpoint dir. Requires every
vertex to have >= 1 out-edge (same precondition as the reference,
PageRankWithEdgeWeights.java:38-41).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_SCALE = 10**12


def out_weight_sums(edges: DataFrame) -> DataFrame:
    """G2/A9 -- reduceOnEdges(OUT) sum of outgoing weights
    (PageRankWithEdgeWeights.java:86-88,112-119)."""
    return edges.groupBy("src").agg(F.sum("weight").alias("out_sum"))


def transition_probabilities(edges: DataFrame) -> DataFrame:
    """G3/J4 -- joinWithEdgesOnSource: per-edge prob = weight / out_sum
    (PageRankWithEdgeWeights.java:91-100)."""
    return edges.join(out_weight_sums(edges), "src").withColumn(
        "prob", F.col("weight") / F.col("out_sum")
    )


def vertices_from_edges(edges: DataFrame) -> DataFrame:
    """G1 -- vertex set = src union dst, distinct
    (PageRankWithEdgeWeights.java:77-83)."""
    return (
        edges.select(F.col("src").alias("vertex"))
        .union(edges.select(F.col("dst").alias("vertex")))
        .distinct()
    )


def weighted_pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
    exact: bool = False,
    checkpoint_every: int = 0,
) -> DataFrame:
    """G4 -- returns (vertex, rank). damping/iterations match the Java
    reference's CLI surface (PageRankWithEdgeWeights.java:47).

    exact=True requires integer-valued weights and an integer damping*100.
    """
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    vertices = vertices_from_edges(edges).repartition(n_part, "vertex").cache()

    if exact:
        d100 = int(round(damping * 100))
        base = (100 - d100) * (RANK_SCALE // 100)
        trans = (
            edges.select(
                "src",
                "dst",
                F.col("weight").cast("bigint").alias("w"),
            )
            .join(
                edges.groupBy("src").agg(F.sum(F.col("weight").cast("bigint")).alias("out_sum")),
                "src",
            )
            .repartition(n_part, "src")
            .cache()
        )
        ranks = vertices.select("vertex", F.lit(RANK_SCALE).cast("bigint").alias("r"))
        for i in range(iterations):
            contribs = (
                trans.join(ranks, trans["src"] == ranks["vertex"])
                .select("dst", F.expr("(r * w) div out_sum").alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("s"))
            )
            ranks = vertices.join(
                contribs, vertices["vertex"] == contribs["dst"], "left"
            ).select(
                "vertex",
                (F.lit(base) + F.expr(f"({d100} * coalesce(s, 0)) div 100"))
                .cast("bigint")
                .alias("r"),
            )
            if checkpoint_every and (i + 1) % checkpoint_every == 0:
                ranks = ranks.localCheckpoint()
        return ranks.select(
            "vertex", (F.col("r").cast("double") / F.lit(float(RANK_SCALE))).alias("rank")
        )

    trans = (
        transition_probabilities(edges)
        .select("src", "dst", "prob")
        .repartition(n_part, "src")
        .cache()
    )
    ranks = vertices.select("vertex", F.lit(1.0).alias("rank"))
    for i in range(iterations):
        contribs = (
            trans.join(ranks, trans["src"] == ranks["vertex"])
            .select("dst", (F.col("rank") * F.col("prob")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = vertices.join(contribs, vertices["vertex"] == contribs["dst"], "left").select(
            "vertex",
            (F.lit(1.0 - damping) + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))).alias(
                "rank"
            ),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint()
    _ = spark  # session retained for future checkpoint-dir support
    return ranks
