"""IVF (inverted-file) approximate nearest neighbor -- the coarse-quantizer
scale path for embedding search (task brief: "an IVF or LSH-bucketed
variant"; LSH lives in operators/similarity.py).

Classic IVF: k-means the corpus into k centroid buckets, search only the
``nprobe`` buckets nearest each query. At 100 TB the assignment is a
broadcast cross join (centroids are tiny) and the probe join is an equi-join
on centroid id -- the cross join over the corpus disappears.

Cross-engine exactness (the interesting part): Lloyd's algorithm is made
bit-deterministic by
  * integer-scaled vectors (floor(x*1e6) -> BIGINT),
  * centroid updates as per-dimension BIGINT sums / member counts (integer
    sums are order-free; the division is one exact double op),
  * argmin with (distance, centroid-id) ordering -- ties deterministic.
So Spark's distributed iterations and DuckDB's unrolled-CTE replay compute
IDENTICAL centroids, assignments, and top-k results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .similarity import _cosine, _dot, _with_int_vec, rank_topk

K_CENTROIDS = 8
KMEANS_ITERS = 3
NPROBE = 2
DIM = 64


def _sq_dist(v: Column, c: Column) -> Column:
    """Squared L2 between BIGINT vector and DOUBLE centroid (sequential
    fold -- same summation order as the oracle's list_sum)."""
    return F.aggregate(
        F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, e: acc + e,
    )


def _init_centroids(base: DataFrame, k: int) -> DataFrame:
    """(cid, c): the k lowest-id vectors, as double arrays."""
    w = Window.orderBy("id")
    return (
        base.orderBy("id")
        .limit(k)
        .select(
            (F.row_number().over(w) - 1).alias("cid"),
            F.transform("v", lambda x: x.cast("double")).alias("c"),
        )
    )


def _assign(base: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast cross join + windowed argmin."""
    crossed = base.crossJoin(F.broadcast(cents)).select(
        "id", "v", "nn", "cid", _sq_dist(F.col("v"), F.col("c")).alias("d")
    )
    w = Window.partitionBy("id").orderBy("d", "cid")
    return (
        crossed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("id", "v", "nn", "cid")
    )


def _update(assigned: DataFrame, prev: DataFrame) -> DataFrame:
    """New centroids: per-dim exact integer means; empty clusters keep the
    previous centroid."""
    sums = (
        assigned.select("cid", F.posexplode("v").alias("dim", "vd"))
        .groupBy("cid", "dim")
        .agg(F.sum("vd").alias("s"), F.count(F.lit(1)).alias("n"))
        .groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("dim", (F.col("s").cast("double") / F.col("n")).alias("m")))
                ),
                lambda st: st["m"],
            ).alias("c")
        )
    )
    missing = prev.join(sums.select("cid"), "cid", "left_anti")
    return sums.unionByName(missing)


def kmeans_assignments(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = K_CENTROIDS,
    iters: int = KMEANS_ITERS,
) -> tuple[DataFrame, DataFrame]:
    """Returns (assigned, centroids) after `iters` exact Lloyd iterations.
    assigned: (id, v, nn, cid); centroids: (cid, c).

    Note: the integer-vector corpus is cached for the iteration loop and
    stays cached while the returned DataFrames are alive -- callers doing
    many k-means runs in one long-lived session should unpersist via
    ``assigned.sparkSession.catalog.clearCache()`` or manage their own
    input caching."""
    base = _with_int_vec(emb, id_col, vec_col).cache()
    cents = _init_centroids(base, n_centroids)
    assigned = None
    for _ in range(iters):
        # materialize centroids so each iteration's plan stays flat
        cents = cents.sparkSession.createDataFrame(cents.collect(), schema=cents.schema)
        assigned = _assign(base, cents)
        cents = _update(assigned, cents)
    cents = cents.sparkSession.createDataFrame(cents.collect(), schema=cents.schema)
    return _assign(base, cents), cents


def ivf_topk(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = K_CENTROIDS,
    iters: int = KMEANS_ITERS,
    nprobe: int = NPROBE,
    topk: int = 5,
    query_mod: int = 25,
) -> DataFrame:
    """IVF search: rank candidates from the nprobe nearest buckets by exact
    cosine. Output (query_id, neighbor_id, rank, cosine) -- same shape as
    the brute-force and LSH variants (whose ``k`` is this function's
    ``topk``; ``n_centroids`` sizes the quantizer)."""
    assigned, cents = kmeans_assignments(emb, id_col, vec_col, n_centroids, iters)
    assigned = assigned.cache()
    queries = assigned.where(F.col("id") % query_mod == 0).select(
        F.col("id").alias("qid"), F.col("v").alias("qv"), F.col("nn").alias("qnn")
    )
    probed = queries.crossJoin(F.broadcast(cents)).select(
        "qid", "qv", "qnn", "cid", _sq_dist(F.col("qv"), F.col("c")).alias("d")
    )
    wp = Window.partitionBy("qid").orderBy("d", "cid")
    probes = (
        probed.withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") <= nprobe)
        .select("qid", "qv", "qnn", "cid")
    )
    cand = probes.join(assigned, "cid").where(F.col("id") != F.col("qid"))
    scored = cand.select(
        F.col("qid").alias("query_id"),
        F.col("id").alias("neighbor_id"),
        _cosine(_dot(F.col("qv"), F.col("v")), F.col("qnn"), F.col("nn")).alias("cosine"),
    )
    return rank_topk(scored, topk)


# ---------------------------------------------------------------------------
# DuckDB oracle: the same algorithm unrolled as chained CTEs.
# ---------------------------------------------------------------------------

def _dist_sql(v: str, c: str, dim: int) -> str:
    return (
        f"list_sum([(({v}[d + 1] - {c}[d + 1]) * ({v}[d + 1] - {c}[d + 1])) "
        f"for d in generate_series(0, {dim - 1})])"
    )


def ivf_topk_oracle(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = K_CENTROIDS,
    iters: int = KMEANS_ITERS,
    nprobe: int = NPROBE,
    topk: int = 5,
    query_mod: int = 25,
    dim: int = DIM,
) -> str:
    k = n_centroids
    dist_bc = _dist_sql("b.v", "c.c", dim)
    parts = [
        f"""WITH base AS (
  SELECT {id_col} AS id,
         [CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT) for x in {vec_col}] AS v
  FROM {table}
), basenn AS (
  SELECT id, v, list_sum([y * y for y in v]) AS nn FROM base
), c0 AS (
  SELECT row_number() OVER (ORDER BY id) - 1 AS cid,
         [CAST(y AS DOUBLE) for y in v] AS c
  FROM (SELECT id, v FROM base ORDER BY id LIMIT {k})
)"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"""a{t} AS (
  SELECT id, v, cid FROM (
    SELECT b.id, b.v, c.cid,
           row_number() OVER (PARTITION BY b.id ORDER BY {dist_bc}, c.cid) AS rn
    FROM base b CROSS JOIN c{t - 1} c
  ) WHERE rn = 1
)"""
        )
        parts.append(
            f"""c{t}_new AS (
  SELECT cid, list(CAST(s AS DOUBLE) / n ORDER BY dim) AS c FROM (
    SELECT cid, dim, sum(vd) AS s, count(*) AS n FROM (
      SELECT cid, unnest(v) AS vd, generate_subscripts(v, 1) AS dim FROM a{t}
    ) GROUP BY cid, dim
  ) GROUP BY cid
)"""
        )
        parts.append(
            f"""c{t} AS (
  SELECT * FROM c{t}_new
  UNION ALL
  SELECT cid, c FROM c{t - 1} WHERE cid NOT IN (SELECT cid FROM c{t}_new)
)"""
        )
    final_assign = f"""afin AS (
  SELECT id, v, cid FROM (
    SELECT b.id, b.v, c.cid,
           row_number() OVER (PARTITION BY b.id ORDER BY {dist_bc}, c.cid) AS rn
    FROM base b CROSS JOIN c{iters} c
  ) WHERE rn = 1
), afin_nn AS (
  SELECT a.id, a.v, a.cid, n.nn FROM afin a JOIN basenn n USING (id)
)"""
    dist_qc = _dist_sql("q.qv", "c.c", dim)
    dot_qa = f"list_sum([q.qv[i] * a.v[i] for i in generate_series(1, {dim})])"
    search = f"""probes AS (
  SELECT qid, qv, qnn, cid FROM (
    SELECT q.qid, q.qv, q.qnn, c.cid,
           row_number() OVER (PARTITION BY q.qid ORDER BY {dist_qc}, c.cid) AS rn
    FROM (SELECT id AS qid, v AS qv, nn AS qnn FROM afin_nn WHERE id % {query_mod} = 0) q
    CROSS JOIN c{iters} c
  ) WHERE rn <= {nprobe}
), scored AS (
  SELECT q.qid AS query_id, a.id AS neighbor_id,
         (CASE WHEN q.qnn = 0 OR a.nn = 0 THEN 0e0
               ELSE CAST({dot_qa} AS DOUBLE)
                    / (sqrt(CAST(q.qnn AS DOUBLE)) * sqrt(CAST(a.nn AS DOUBLE))) END)
           AS cosine
  FROM probes q JOIN afin_nn a USING (cid) WHERE a.id != q.qid
)
SELECT query_id, neighbor_id, rank, cosine FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= {topk}"""
    return ",\n".join(parts + [final_assign, search])
