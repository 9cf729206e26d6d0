"""Deduplication operators for large-scale training-data pipelines.

Not part of the reference's surface -- these are the operations a 100 TB
corpus pipeline needs on top of it (task brief): exact dedup, MinHash+LSH,
SimHash, and n-gram Jaccard similarity join. Each operator ships with a
DuckDB SQL twin generator so the driver's differential gate covers it.

Design for scale (all JVM-side Column expressions, no Python in the path):

  * shingling / hashing happen per-row inside array expressions -- no row
    explosion for MinHash signatures (k passes over an array beat exploding
    |doc| * k rows through a shuffle);
  * LSH banding turns the O(n^2) similarity join into an equi-join on
    (band, key) -- the only shuffle is on band keys, and candidate
    verification joins fetch shingle arrays by id;
  * all hashes go through functions.hashing (md5-based) so Spark and DuckDB
    agree bit-for-bit; Jaccard/Hamming arithmetic stays in integers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import MERSENNE_P, hash_params, md5_long_sql

SHINGLE_WIDTH = 5
# 8 bands x 4 rows: candidate probability 1-(1-j^4)^8 -- near-certain at
# j>=0.8, ~1% at j=0.2. r=2 banding floods the verify join with low-quality
# candidates (measured 25x slower at sf0.1 for zero extra true dups).
MINHASH_K = 32
MINHASH_BANDS = 8
SIMHASH_BITS = 32

_MINHASH_PARAMS = hash_params(MINHASH_K)


def _md5_long_c(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def _jaccard_c(inter: str = "inter", tot: str = "tot") -> Column:
    """Guarded Jaccard |A∩B| / |A∪B| from inter=|A∩B|, tot=|A|+|B|.

    The denominator (tot - inter) is 0 only when two empty-shingle docs
    pair; guard explicitly (repo rule: guard ALL divisions under ANSI)
    rather than relying on NaN/NULL both failing the >= threshold filter.
    NULL on zero matches the SQL twins' NULLIF -- dropped by the filter on
    both engines, so gated output is unchanged."""
    denom = F.col(tot) - F.col(inter)
    return F.when(denom > 0, F.col(inter).cast("double") / denom)


# ---------------------------------------------------------------------------
# Exact dedup (hash-groupBy)
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, key: Column, id_col: str) -> DataFrame:
    """Keep one deterministic survivor (min id) per exact key; reports group
    size so callers can split survivors/victims. A hash-partitioned groupBy:
    one shuffle on the key, map-side combined."""
    return (
        df.select(key.alias("dedup_key"), F.col(id_col))
        .groupBy("dedup_key")
        .agg(F.min(id_col).alias("survivor_id"), F.count(F.lit(1)).alias("group_size"))
    )


def normalized_prefix_key(text_col: str, n_words: int = 5) -> Column:
    """Normalization key: first n words of lower/whitespace-collapsed text."""
    words = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
    return F.concat_ws(" ", F.slice(words, 1, n_words))


def normalized_prefix_key_sql(text_expr: str, n_words: int = 5) -> str:
    return (
        f"array_to_string(([x for x in string_split_regex(lower({text_expr}), '\\s+') "
        f"if x != ''])[1:{n_words}], ' ')"
    )


# ---------------------------------------------------------------------------
# Shingles + MinHash + LSH
# ---------------------------------------------------------------------------


def char_shingles(text_col: str, width: int = SHINGLE_WIDTH) -> Column:
    """Distinct character w-grams of a text column, as an array -- computed
    per row, no explosion."""
    text = F.col(text_col)
    positions = F.sequence(F.lit(1), F.greatest(F.length(text) - (width - 1), F.lit(1)))
    return F.array_distinct(F.transform(positions, lambda i: text.substr(i, F.lit(width))))


def char_shingles_sql(text_expr: str, width: int = SHINGLE_WIDTH) -> str:
    return (
        f"list_distinct([substr({text_expr}, i, {width}) "
        f"for i in generate_series(1, greatest(length({text_expr}) - {width - 1}, 1))])"
    )


def shingle_hashes_df(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, hs): distinct md5 shingle hashes per doc -- the shared input of
    both the signature pass and the exact-Jaccard verify. hs (60-bit
    bigints), not shingle strings: bigint set intersection is much cheaper
    and Jaccard is identical (md5 collisions deterministic & negligible).

    widen_scan: the k-pass signature scan is the pipeline's CPU bottleneck;
    a single-split local file would run it on one core (no-op at scale)."""
    from ..sources.loaders import widen_scan

    docs = widen_scan(docs)
    return docs.select(
        F.col(id_col).alias("id"),
        F.array_distinct(
            F.transform(char_shingles(text_col), _md5_long_c)
        ).alias("hs"),
    )


_SIG_PERSISTED: dict[tuple, DataFrame] = {}


def persisted_signatures(
    docs: DataFrame, id_col: str, text_col: str, k: int = MINHASH_K
) -> DataFrame:
    """MEMORY_AND_DISK-persisted (id, hs, s0..s{k-1}) signature table,
    memoized on the input plan -- repeated invocations in one session
    (oracle gate + bench + tests) REUSE one persisted copy instead of
    stacking new ones (the round-1 leak). release_persisted_signatures()
    drops them all. At cluster scale this is the standard 'materialize
    signatures once' table a 100 TB dedup writes before banding."""
    from pyspark.storagelevel import StorageLevel

    df = signatures_from_hashes(shingle_hashes_df(docs, id_col, text_col), k)
    key = (df.semanticHash(), id_col, text_col, k)
    if key not in _SIG_PERSISTED:
        _SIG_PERSISTED[key] = df.persist(StorageLevel.MEMORY_AND_DISK)
    return _SIG_PERSISTED[key]


def release_persisted_signatures() -> None:
    for df in _SIG_PERSISTED.values():
        df.unpersist()
    _SIG_PERSISTED.clear()


_CLUSTER_PERSISTED: dict[int, DataFrame] = {}


def persisted_cluster_map(pairs: DataFrame) -> DataFrame:
    """MEMORY_AND_DISK-persisted (id, comp) connected-components closure of
    a near-dup pair relation, memoized on the pair plan (same pattern as
    :func:`persisted_signatures`). dedup_clusters_minhash, dedup_keep_best
    and embedding_dedup_clusters all consume the SAME closure, so one
    session computes MinHash/LSH + the CC loop once and every later
    consumer reads the persisted (id -> component) map instead of
    re-running the whole subtree. release_persisted_cluster_maps() drops
    them (bench.py / check_oracle.py call it between queries, keeping
    per-query timings order-independent). At 100 TB this is the
    materialized cluster-assignment table a dedup pipeline writes once
    and joins everywhere downstream (survivor selection, audit trails,
    shard layout)."""
    from pyspark.storagelevel import StorageLevel

    from . import graph

    key = pairs.semanticHash()
    if key not in _CLUSTER_PERSISTED:
        cc = graph.connected_components(pairs)
        _CLUSTER_PERSISTED[key] = cc.persist(StorageLevel.MEMORY_AND_DISK)
    return _CLUSTER_PERSISTED[key]


def release_persisted_cluster_maps() -> None:
    for df in _CLUSTER_PERSISTED.values():
        df.unpersist()
    _CLUSTER_PERSISTED.clear()


def signatures_from_hashes(hs_df: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """k permuted min-hashes over an (id, hs) table -> (id, hs, s0..s{k-1})."""
    def perm(a: int, b: int):
        # real 1-arg lambda: a default-arg closure would make Spark treat it
        # as the (elem, idx, ...) 3-arg higher-order signature
        return lambda h: (F.lit(a) * (h % MERSENNE_P) + F.lit(b)) % MERSENNE_P

    sig_cols = [
        F.array_min(F.transform(F.col("hs"), perm(a, b))).alias(f"s{i}")
        for i, (a, b) in enumerate(_MINHASH_PARAMS[:k])
    ]
    return hs_df.select("id", F.col("hs"), *sig_cols)


def minhash_signature_df(
    docs: DataFrame, id_col: str, text_col: str, k: int = MINHASH_K
) -> DataFrame:
    """(id, hs, s0..s{k-1}): shingle-hash array + k permuted min-hashes.

    The md5 hash array is computed once (shingle_hashes_df) and the k
    permutation passes share it instead of re-hashing k times."""
    return signatures_from_hashes(shingle_hashes_df(docs, id_col, text_col), k)


BAND_KEY_P = 2147483647  # 2^31-1: keeps the fold's products under 2^62


def _band_key_fold(sig_cols: list[Column], band: int) -> Column:
    """Single-bigint band key: polynomial fold of the band's signature
    values mod BAND_KEY_P, seeded with the band index (so keys from
    different bands never equi-join by construction aside from fold
    collisions, which both engines reproduce identically)."""
    acc: Column = F.lit(band).cast("bigint")
    for c in sig_cols:
        acc = (acc * F.lit(1000003) + (c % F.lit(BAND_KEY_P))) % F.lit(BAND_KEY_P)
    return acc


def _band_key_fold_sql(sig_exprs: list[str], band: int) -> str:
    acc = str(band)
    for e in sig_exprs:
        acc = f"(({acc}) * 1000003 + ({e}) % {BAND_KEY_P}) % {BAND_KEY_P}"
    return acc


def minhash_signature_sql(shingles_expr: str, k: int = MINHASH_K) -> list[str]:
    hs = f"[{md5_long_sql('s')} for s in {shingles_expr}]"
    return [
        f"list_min([({a} * (h % {MERSENNE_P}) + {b}) % {MERSENNE_P} for h in {hs}])"
        for a, b in _MINHASH_PARAMS[:k]
    ]


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    threshold: float = 0.2,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact Jaccard verify.

    Pipeline: per-doc signature (no shuffle) -> explode to `bands` rows ->
    equi-join on a single BIGINT band key -> distinct candidate pairs ->
    fetch shingle sets by id -> exact Jaccard filter. Output
    (id_a < id_b, jaccard). At 100 TB the band join is the only wide
    shuffle and its keys are uniformly distributed by construction.

    The band key is a polynomial fold of the band's signature values mod
    2^31-1, seeded with the band index -- a single bigint instead of a
    comma-joined string (8 bytes vs ~80, and integer hashing/compare in the
    shuffle). Both engines compute the identical fold, so a (vanishingly
    rare) fold collision yields the same extra candidate on both sides and
    the exact Jaccard verify stays differential-safe.

    Candidate generation is a groupBy on the band key + per-bucket pair
    expansion in array expressions, NOT a self-join (which would evaluate
    the signature pipeline once per side). Per-bucket cost is quadratic in
    bucket size -- inherent to LSH banding; at corpus scale cap or salt
    pathological buckets (an all-identical-boilerplate flood) before this
    operator.

    The signature table -- the one input every stage shares -- is persisted
    once per distinct input (MEMORY_AND_DISK, memoized; see
    persisted_signatures) so banding and both verify probes read it instead
    of re-hashing the corpus; the verify joins broadcast the candidate-pair
    set against it, so shingle arrays are never shuffled corpus-wide. At
    cluster scale the persisted table is a one-time signature
    materialization, the idiom a 100 TB dedup would use anyway.
    """
    r = k // bands
    sig_df = persisted_signatures(docs, id_col, text_col, k)
    hs_tbl = sig_df.select("id", "hs")
    band_keys = [
        _band_key_fold([F.col(f"s{b * r + j}") for j in range(r)], b) for b in range(bands)
    ]
    banded = sig_df.select("id", F.explode(F.array(*band_keys)).alias("key"))
    buckets = (
        banded.groupBy("key")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    pairs = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    sa = hs_tbl.select(F.col("id"), F.col("hs").alias("sh_a"))
    sb = hs_tbl.select(F.col("id"), F.col("hs").alias("sh_b"))
    verified = (
        pairs.join(sa, F.col("id_a") == sa["id"])
        .drop("id")
        .join(sb, F.col("id_b") == sb["id"])
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("inter"),
            (F.size("sh_a") + F.size("sh_b")).alias("tot"),
        )
        .select(
            "id_a",
            "id_b",
            _jaccard_c().alias("jaccard"),
        )
    )
    return verified.where(F.col("jaccard") >= threshold)


def minhash_lsh_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    threshold: float = 0.2,
) -> str:
    r = k // bands
    sigs = minhash_signature_sql(char_shingles_sql(text_col), k)
    sig_cols = ", ".join(f"{s} AS s{i}" for i, s in enumerate(sigs))
    band_keys = ", ".join(
        _band_key_fold_sql([f"s{b * r + j}" for j in range(r)], b) for b in range(bands)
    )
    hs = f"list_distinct([{md5_long_sql('s')} for s in {char_shingles_sql(text_col)}])"
    return f"""
WITH shingled AS (
  SELECT {id_col} AS id, {hs} AS sh FROM {table}
),
sigs AS (SELECT {id_col} AS id, {sig_cols} FROM {table}),
banded AS (
  SELECT id, CAST(unnest([{band_keys}]) AS BIGINT) AS key FROM sigs
),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM banded a JOIN banded b ON a.key = b.key AND a.id < b.id
),
verified AS (
  SELECT id_a, id_b,
         len(list_intersect(sa.sh, sb.sh)) AS inter,
         len(sa.sh) + len(sb.sh) AS tot
  FROM pairs JOIN shingled sa ON id_a = sa.id JOIN shingled sb ON id_b = sb.id
)
SELECT id_a, id_b, CAST(inter AS DOUBLE) / NULLIF(tot - inter, 0) AS jaccard
FROM verified WHERE CAST(inter AS DOUBLE) / NULLIF(tot - inter, 0) >= {threshold}
"""


def incremental_minhash_matches(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    threshold: float = 0.2,
    batch_bp: int = 2000,
) -> DataFrame:
    """Incremental dedup: match a NEW batch of documents against an existing
    corpus -- the continuous-crawl shape, where each day's shard is deduped
    against everything already ingested rather than all-pairs against
    itself. Output (new_id, corpus_id, jaccard >= threshold).

    The batch/corpus split here is a deterministic md5 predicate on the id
    (batch = md5(id) % 10000 < batch_bp) so the DuckDB twin reproduces it;
    in production the batch is simply the new shard's table.

    Scale shape: the corpus side's banded signatures are the standing LSH
    index (at 100 TB, a materialized table written once and appended to);
    the new batch is orders of magnitude smaller, so its banded signatures
    broadcast and the corpus is probed with a broadcast hash join on the
    band key -- NO corpus shuffle, no all-pairs anything. Verification
    fetches only the matched candidates' shingle sets. Signature pipeline,
    band keys, and Jaccard verify are shared with minhash_lsh_pairs
    (persisted once via persisted_signatures)."""
    r = k // bands
    sig_df = persisted_signatures(docs, id_col, text_col, k)
    is_new = _md5_long_c(F.col("id").cast("string")) % 10000 < batch_bp
    band_keys = [
        _band_key_fold([F.col(f"s{b * r + j}") for j in range(r)], b) for b in range(bands)
    ]
    banded = sig_df.select("id", F.explode(F.array(*band_keys)).alias("key"))
    new_b = banded.where(is_new).select(F.col("id").alias("new_id"), "key")
    corp_b = banded.where(~is_new).select(F.col("id").alias("corpus_id"), "key")
    pairs = corp_b.join(new_b, "key").select("new_id", "corpus_id").distinct()
    hs_tbl = sig_df.select("id", "hs")
    sn = hs_tbl.select(F.col("id"), F.col("hs").alias("sh_n"))
    sc = hs_tbl.select(F.col("id"), F.col("hs").alias("sh_c"))
    verified = (
        pairs.join(sn, F.col("new_id") == sn["id"])
        .drop("id")
        .join(sc, F.col("corpus_id") == sc["id"])
        .select(
            "new_id",
            "corpus_id",
            F.size(F.array_intersect("sh_n", "sh_c")).alias("inter"),
            (F.size("sh_n") + F.size("sh_c")).alias("tot"),
        )
        .select(
            "new_id",
            "corpus_id",
            _jaccard_c().alias("jaccard"),
        )
    )
    return verified.where(F.col("jaccard") >= threshold)


def incremental_minhash_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    threshold: float = 0.2,
    batch_bp: int = 2000,
) -> str:
    r = k // bands
    sigs = minhash_signature_sql(char_shingles_sql(text_col), k)
    sig_cols = ", ".join(f"{s} AS s{i}" for i, s in enumerate(sigs))
    band_keys = ", ".join(
        _band_key_fold_sql([f"s{b * r + j}" for j in range(r)], b) for b in range(bands)
    )
    hs = f"list_distinct([{md5_long_sql('s')} for s in {char_shingles_sql(text_col)}])"
    is_new_n = f"{md5_long_sql('CAST(n.id AS VARCHAR)')} % 10000 < {batch_bp}"
    is_new_c = f"{md5_long_sql('CAST(c.id AS VARCHAR)')} % 10000 < {batch_bp}"
    return f"""
WITH shingled AS (
  SELECT {id_col} AS id, {hs} AS sh FROM {table}
),
sigs AS (SELECT {id_col} AS id, {sig_cols} FROM {table}),
banded AS (
  SELECT id, CAST(unnest([{band_keys}]) AS BIGINT) AS key FROM sigs
),
pairs AS (
  SELECT DISTINCT n.id AS new_id, c.id AS corpus_id
  FROM banded c JOIN banded n ON c.key = n.key
  WHERE ({is_new_n}) AND NOT ({is_new_c})
),
verified AS (
  SELECT new_id, corpus_id,
         len(list_intersect(sn.sh, sc.sh)) AS inter,
         len(sn.sh) + len(sc.sh) AS tot
  FROM pairs JOIN shingled sn ON new_id = sn.id JOIN shingled sc ON corpus_id = sc.id
)
SELECT new_id, corpus_id, CAST(inter AS DOUBLE) / NULLIF(tot - inter, 0) AS jaccard
FROM verified WHERE CAST(inter AS DOUBLE) / NULLIF(tot - inter, 0) >= {threshold}
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs via 32-bit SimHash over word tokens, banded into
    4 bytes for candidate generation, verified by Hamming distance.

    Explode words -> 32 map-side-combined bit-counter sums per doc (ints, so
    partial aggregation is exact) -> bigint signature -> 4-byte band
    equi-join -> bit_count(xor) verify. Output (id_a < id_b, hamming)."""
    from ..sources.loaders import widen_scan

    docs = widen_scan(docs)
    words = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
        ).alias("w"),
    ).select("id", _md5_long_c(F.col("w")).alias("h"))
    bit_sums = words.groupBy("id").agg(
        *[
            F.sum(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"b{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    sim_expr = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"b{j}") > 0, F.lit(1 << j).cast("bigint")).otherwise(F.lit(0))
        sim_expr = term if sim_expr is None else sim_expr + term
    sims = bit_sums.select("id", sim_expr.alias("sim"))

    banded = sims.select(
        "id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("sim"), 8 * b).bitwiseAND(F.lit(255)).alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("id", "sim", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b_ = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            # bigint cast: width-align with the oracle (driver tolerates
            # width skew today; one cast removes the reliance)
            F.bit_count(F.col("a.sim").bitwiseXOR(F.col("b.sim")))
            .cast("bigint")
            .alias("hamming"),
        )
        .distinct()
    )
    return pairs.where(F.col("hamming") <= max_hamming)


def simhash_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> str:
    h = md5_long_sql("w")
    bit_sum_cols = ", ".join(
        f"sum((({h} >> {j}) & 1) * 2 - 1) AS b{j}" for j in range(SIMHASH_BITS)
    )
    sim = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    bands = " UNION ALL ".join(
        f"SELECT id, sim, {b} AS band, (sim >> {8 * b}) & 255 AS key FROM sims"
        for b in range(4)
    )
    return f"""
WITH words AS (
  SELECT {id_col} AS id, unnest([x for x in string_split_regex(lower({text_col}), '\\s+') if x != '']) AS w
  FROM {table}
),
bit_sums AS (SELECT id, {bit_sum_cols} FROM words GROUP BY id),
sims AS (SELECT id, {sim} AS sim FROM bit_sums),
banded AS ({bands}),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
  FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key AND a.id < b.id
)
SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= {max_hamming}
"""


# ---------------------------------------------------------------------------
# N-gram Jaccard similarity join (exact, partition-scoped)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    partition_col: str = "source",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact word n-gram Jaccard pairs within a partition column (the
    shard-scoped dedup a corpus pipeline runs; cross-shard pairs are the
    MinHash operator's job). The pair join is an equi-join on the partition
    key; Jaccard over per-row distinct n-gram arrays stays in integers.

    Grams are md5-hashed to bigints per row BEFORE the pair join (one hash
    pass over the corpus), so the quadratic intersect works on bigint sets
    instead of ~20-char strings -- same trick as the MinHash verify; both
    engines hash identically, so the (negligible, deterministic) collision
    behavior is differential-safe."""
    from ..sources.loaders import widen_scan

    docs = widen_scan(docs)
    words = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        )
    )
    hashed = F.array_distinct(F.transform(grams, _md5_long_c))
    g = docs.select(
        F.col(id_col).alias("id"), F.col(partition_col).alias("part"), hashed.alias("g")
    )
    a, b = g.alias("a"), g.alias("b")
    return (
        a.join(b, (F.col("a.part") == F.col("b.part")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.size(F.array_intersect(F.col("a.g"), F.col("b.g"))).alias("inter"),
            (F.size("a.g") + F.size("b.g")).alias("tot"),
        )
        .select(
            "id_a",
            "id_b",
            _jaccard_c().alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    partition_col: str = "source",
    n: int = 3,
    threshold: float = 0.5,
) -> str:
    words = f"[x for x in string_split_regex(lower({text_col}), '\\s+') if x != '']"
    return f"""
WITH g AS (
  SELECT id, part, list_distinct([{md5_long_sql('x')} for x in gs]) AS g
  FROM (
    SELECT {id_col} AS id, {partition_col} AS part,
           list_distinct([array_to_string(w[i:i+{n - 1}], ' ')
                          for i in generate_series(1, greatest(len(w) - {n - 1}, 1))]) AS gs
    FROM (SELECT {id_col}, {partition_col}, {words} AS w FROM {table})
  )
),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         len(list_intersect(a.g, b.g)) AS inter,
         len(a.g) + len(b.g) AS tot
  FROM g a JOIN g b ON a.part = b.part AND a.id < b.id
)
SELECT id_a, id_b, CAST(inter AS DOUBLE) / NULLIF(tot - inter, 0) AS jaccard
FROM pairs WHERE CAST(inter AS DOUBLE) / NULLIF(tot - inter, 0) >= {threshold}
"""


def minhash_clusters_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    threshold: float = 0.2,
) -> str:
    """Oracle twin of pairs -> connected components -> (doc, cluster-min).

    DuckDB computes the transitive closure with a recursive CTE (fine at
    oracle scale; the Spark side uses the O(log n)-round alternating
    star algorithm instead -- a recursive closure is exactly what does NOT
    scale, see graph.connected_components)."""
    pairs_sql = minhash_lsh_sql(table, id_col, text_col, k, bands, threshold)
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
),
walk(id, comp) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.v, w.comp FROM walk w JOIN edges e ON e.u = w.id
)
SELECT id AS doc_id, CAST(min(comp) AS BIGINT) AS cluster_id
FROM walk GROUP BY id
"""


def minhash_lsh_recall(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    threshold: float = 0.2,
    sample_bp: int = 1000,
) -> DataFrame:
    """Quality bar for the LSH dedup path, the dedup analogue of
    ann_recall_at_k: on a deterministic md5 sample of documents, compare
    the banded-LSH pair set against EXACT all-pairs Jaccard ground truth.
    Output one row (n_exact, n_lsh, n_hits) of integer counts -- recall =
    hits/exact, precision = hits/lsh, both hash-exact across engines.

    Read the number against the banding curve, not against 100%: with
    8 bands x r=4 the candidate probability is 1-(1-j^4)^8 -- near-certain
    at j>=0.8 (the duplicates the operator exists to catch), ~1.3% at
    j=0.2. This corpus's sampled pairs all sit in [0.2, 0.3), and the
    measured recall (4/389 ~ 1.0% at sf0.01) matches the theoretical curve
    -- the audit validates the banding design empirically.

    The exact all-pairs side is quadratic BY DESIGN and restricted to the
    bounded sample (~sample_bp/10000 of the corpus) -- ground truth is a
    sampled audit at any scale, never a full computation."""
    in_sample = _md5_long_c(F.col("id").cast("string")) % 10000 < sample_bp
    # the sampled shingle frame feeds BOTH sides of the all-pairs join
    # (a bare self-join evaluates the expensive shingling subtree once
    # per side -- the CLAUDE.md round-2 rule); the materialization is
    # sample-bounded by design
    hs = shingle_hashes_df(docs, id_col, text_col).where(in_sample).localCheckpoint()
    a = hs.select(F.col("id").alias("id_a"), F.col("hs").alias("sh_a"))
    b = hs.select(F.col("id").alias("id_b"), F.col("hs").alias("sh_b"))
    exact = (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("inter"),
            (F.size("sh_a") + F.size("sh_b")).alias("tot"),
        )
        .select("id_a", "id_b", _jaccard_c().alias("j"))
        .where(F.col("j") >= threshold)
        .select("id_a", "id_b")
    )
    lsh = minhash_lsh_pairs(docs, id_col, text_col, k, bands, threshold).where(
        (_md5_long_c(F.col("id_a").cast("string")) % 10000 < sample_bp)
        & (_md5_long_c(F.col("id_b").cast("string")) % 10000 < sample_bp)
    ).select("id_a", "id_b")
    # single pass: full-outer-join the two pair sets and count conditionally,
    # so the quadratic `exact` subtree and the LSH pipeline are each
    # evaluated ONCE (three separate aggs would re-run them per agg --
    # the re-evaluation trap in CLAUDE.md's round-2 notes)
    marked = exact.withColumn("in_e", F.lit(1)).join(
        lsh.withColumn("in_l", F.lit(1)), ["id_a", "id_b"], "full_outer"
    )
    return marked.agg(
        F.count("in_e").alias("n_exact"),
        F.count("in_l").alias("n_lsh"),
        F.count(F.when(F.col("in_e").isNotNull() & F.col("in_l").isNotNull(), 1)).alias(
            "n_hits"
        ),
    )


def minhash_lsh_recall_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    threshold: float = 0.2,
    sample_bp: int = 1000,
) -> str:
    lsh_sql = minhash_lsh_sql(table, id_col, text_col, k, bands, threshold)
    hs = f"list_distinct([{md5_long_sql('s')} for s in {char_shingles_sql(text_col)}])"
    in_a = f"{md5_long_sql('CAST(id_a AS VARCHAR)')} % 10000 < {sample_bp}"
    in_b = f"{md5_long_sql('CAST(id_b AS VARCHAR)')} % 10000 < {sample_bp}"
    in_s = f"{md5_long_sql(f'CAST({id_col} AS VARCHAR)')} % 10000 < {sample_bp}"
    return f"""
WITH sampled AS (
  SELECT {id_col} AS id, {hs} AS sh FROM {table} WHERE {in_s}
),
exact AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM sampled a JOIN sampled b ON a.id < b.id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / NULLIF(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)), 0)
        >= {threshold}
),
lsh AS (
  SELECT id_a, id_b FROM ({lsh_sql}) WHERE ({in_a}) AND ({in_b})
),
ne AS (SELECT count(*) AS n_exact FROM exact),
nl AS (SELECT count(*) AS n_lsh FROM lsh),
nh AS (SELECT count(*) AS n_hits FROM exact JOIN lsh USING (id_a, id_b))
SELECT CAST(n_exact AS BIGINT) AS n_exact, CAST(n_lsh AS BIGINT) AS n_lsh,
       CAST(n_hits AS BIGINT) AS n_hits
FROM ne CROSS JOIN nl CROSS JOIN nh
"""


# ---------------------------------------------------------------------------
# Repeated n-gram coverage (exact-substring dedup statistic)
# ---------------------------------------------------------------------------

REPEAT_NGRAM_N = 8


def repeated_ngram_coverage(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = REPEAT_NGRAM_N,
) -> DataFrame:
    """Per-document repeated-n-gram statistics against the whole corpus --
    the measurement half of exact-substring deduplication (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): a doc
    whose n-grams mostly appear in OTHER docs is boilerplate or a
    near-copy, even when no single pair-level match fires.

    Output per doc (docs with >= 1 n-gram): n_grams (distinct), n_repeated
    (grams whose corpus document-frequency >= 2), repeat_frac.

    Scale shape (100 TB): per-doc DISTINCT happens array-side before the
    explode (bounds rows at distinct-grams-per-doc), the md5 fold runs
    row-level AFTER the explode (codegen'd, not per-element interpreted --
    the round-3 contamination lesson), and the df count + join-back share
    one hash partitioning on the gram key: groupBy(gh) then join on gh
    reuses the exchange. No raw text crosses a shuffle -- only 60-bit gram
    hashes. This is the same one-key-shuffle skeleton as
    suffix-array-based exact-substring dedup's shard-and-count phase, with
    n-gram granularity standing in for full suffix automata."""
    from ..sources.loaders import widen_scan
    from .contamination import _gram_strings, _words

    grams = (
        widen_scan(docs)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(_gram_strings(_words(text_col), n)).alias("gram"),
        )
        .select("doc_id", _md5_long_c(F.col("gram")).alias("gh"))
    )
    dfreq = grams.groupBy("gh").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        grams.join(dfreq, "gh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_repeated"),
        )
    )
    # n_grams >= 1 by construction (grouped over exploded grams); the guard
    # keeps the ANSI division invariant explicit anyway
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_repeated",
        F.when(
            F.col("n_grams") > 0,
            F.round(F.col("n_repeated") / F.col("n_grams"), 6),
        ).alias("repeat_frac"),
    )


def repeated_ngram_coverage_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = REPEAT_NGRAM_N,
) -> str:
    """DuckDB twin of :func:`repeated_ngram_coverage` (same tokenizer, same
    string-level distinct, same post-explode md5 fold)."""
    w = f"[x for x in string_split_regex(lower({text_col}), '\\s+') if x != '']"
    slots = ", ".join("ws[i]" if j == 0 else f"ws[i+{j}]" for j in range(n))
    return f"""
WITH w AS (
  SELECT {id_col} AS doc_id, {w} AS ws FROM {table}
), grams AS (
  SELECT doc_id,
         {md5_long_sql('g')} AS gh
  FROM (
    SELECT doc_id,
           unnest(list_distinct([concat_ws(' ', {slots})
                   for i in generate_series(1, greatest(len(ws) - {n - 1}, 0))])) AS g
    FROM w
  )
), dfreq AS (
  SELECT gh, count(*) AS df FROM grams GROUP BY 1
), per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         CAST(count(*) FILTER (WHERE df >= 2) AS BIGINT) AS n_repeated
  FROM grams JOIN dfreq USING (gh) GROUP BY 1
)
SELECT doc_id, n_grams, n_repeated,
       CASE WHEN n_grams > 0
            THEN round(CAST(n_repeated AS DOUBLE) / n_grams, 6) END AS repeat_frac
FROM per_doc
"""


# ---------------------------------------------------------------------------
# Blocked edit-distance near-dup (Levenshtein within blocking keys)
# ---------------------------------------------------------------------------


def editdistance_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: tuple[str, ...] = ("lang", "source"),
    prefix_len: int = 40,
    max_dist: int = 25,
) -> DataFrame:
    """Near-duplicate pairs by Levenshtein distance over a normalized
    header prefix (lower + first ``prefix_len`` chars), compared only
    WITHIN blocking keys -- the record-linkage staple for short-text /
    title dedup where set-based similarity (MinHash shingles) is too
    coarse. Output (id_a, id_b, dist) with id_a < id_b.

    Scale shape (100 TB): the quadratic is confined to blocks -- the join
    is an equi-join on ``block_cols`` (one shuffle, blocks co-located),
    and per-block cost is |block|^2 * prefix_len^2 character ops. Blocking
    keys must be chosen to bound |block| (here lang x source; production
    adds a length band or a cheap content band to split hot blocks --
    same key-design discipline as skew.py's salting). Levenshtein itself
    is the classic Wagner-Fischer DP, identical semantics in Spark and
    DuckDB."""
    d = docs.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id"),
        F.lower(F.substring(F.col(text_col), 1, prefix_len)).alias("t"),
    )
    a, b = d.alias("a"), d.alias("b")
    cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols] + [
        F.col("a.id") < F.col("b.id")
    ]
    # r13 optimization (guide §1.2 per-task work): the thresholded
    # levenshtein (Spark 3.5+) runs a banded DP with early exit and
    # returns -1 above the threshold; kept rows get the exact distance,
    # so (dist != -1) selects exactly the (dist <= max_dist) rows with
    # identical dist values -- ~10% off the pair-verify stage at sf0.1,
    # more when max_dist << prefix_len (band narrows the DP).
    dist = F.levenshtein(F.col("a.t"), F.col("b.t"), max_dist)
    return (
        a.join(b, cond)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            dist.cast("bigint").alias("dist"),
        )
        .where(F.col("dist") != -1)
    )


def editdistance_pairs_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: tuple[str, ...] = ("lang", "source"),
    prefix_len: int = 40,
    max_dist: int = 25,
) -> str:
    blocks = " AND ".join(f"a.{c} = b.{c}" for c in block_cols)
    return f"""
WITH d AS (
  SELECT {id_col} AS id, {", ".join(block_cols)},
         lower(substr({text_col}, 1, {prefix_len})) AS t
  FROM {table}
)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
FROM d a JOIN d b ON {blocks} AND a.id < b.id
WHERE levenshtein(a.t, b.t) <= {max_dist}
"""


# ---------------------------------------------------------------------------
# CCNet-style corpus-wide segment dedup (keep-first)
# ---------------------------------------------------------------------------

SEGMENT_WORDS = 3  # non-overlapping segment width, in tokens
_SEG_PACK = 1 << 20  # seg_idx packing radix: supports docs up to ~3M tokens


def segment_dedup_keepfirst(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """CCNet-style segment-hash dedup (Wenzek et al. 2020 dedup stage): cut
    each document into non-overlapping ``SEGMENT_WORDS``-token segments, hash
    them, and keep only the FIRST occurrence of every distinct segment across
    the whole corpus (first = lowest (doc_id, seg_idx)). CCNet segments on
    lines; this corpus has no newlines, so the segmenter is a fixed-width
    token grid -- the corpus-wide keep-first shape is identical.

    Output per doc: segment counts and token counts before/after dedup --
    the doc-level retention profile a curation pipeline thresholds on.

    Determinism: segments are md5-folded (cross-engine identical); the
    keep-first winner is the minimum of ``doc_id * 2^20 + seg_idx`` over
    each hash -- exact BIGINT, no ties possible.

    Scale shape (100 TB): segmenting is a per-row array expression (no
    shuffle); the only wide stage is ONE window over the segment hash (the
    same single shuffle any corpus-wide groupBy pays), then a groupBy on
    doc_id that AQE plans off the exploded size. A segment duplicated
    billions of times lands in one partition only for a min() -- constant
    state per key, no list materialization, so skew degrades to a cheap
    running min rather than a blowup."""
    from pyspark.sql import Window

    from ..sources.loaders import widen_scan

    docs = widen_scan(docs)
    w = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
    n_seg = F.floor((F.size(w) - F.lit(1)) / F.lit(SEGMENT_WORDS)).cast("int") + F.lit(1)
    segs = F.transform(
        F.sequence(F.lit(0), n_seg - F.lit(1)),
        lambda k: F.struct(
            k.cast("bigint").alias("seg_idx"),
            F.concat_ws(" ", F.slice(w, k * SEGMENT_WORDS + 1, SEGMENT_WORDS)).alias(
                "seg"
            ),
            F.size(F.slice(w, k * SEGMENT_WORDS + 1, SEGMENT_WORDS))
            .cast("bigint")
            .alias("nw"),
        ),
    )
    exploded = (
        docs.where(F.size(w) > 0)
        .select(F.col(id_col).alias("doc_id"), F.explode(segs).alias("s"))
        .select(
            "doc_id",
            F.col("s.seg_idx").alias("seg_idx"),
            F.col("s.nw").alias("nw"),
            _md5_long_c(F.col("s.seg")).alias("gh"),
        )
    )
    # guard the packing radix: a seg_idx >= 2^20 would alias into the next
    # doc_id's key range and silently corrupt the keep-first winner -- fail
    # loudly instead (both engines; the oracle twin carries the same guard)
    packed = F.when(
        F.col("seg_idx") < _SEG_PACK,
        F.col("doc_id") * F.lit(_SEG_PACK) + F.col("seg_idx"),
    ).otherwise(
        F.raise_error(
            F.lit("segment index exceeds packing radix 2^20; raise _SEG_PACK")
        )
    )
    kept = (
        packed == F.min(packed).over(Window.partitionBy("gh"))
    ).cast("bigint")
    marked = exploded.select("doc_id", "nw", kept.alias("kept"))
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("kept").alias("n_kept_segments"),
        F.sum("nw").alias("n_words_total"),
        F.sum(F.col("nw") * F.col("kept")).alias("n_words_kept"),
    )


def segment_dedup_keepfirst_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`segment_dedup_keepfirst` (same tokenizer, same
    fixed-width grid, same packed-min keep-first rule)."""
    w = f"[x for x in string_split_regex(lower({text_col}), '\\s+') if x != '']"
    n = SEGMENT_WORDS
    return f"""
WITH w AS (
  SELECT {id_col} AS doc_id, {w} AS ws FROM {table}
), seg AS (
  SELECT doc_id, s.seg_idx AS seg_idx, s.nw AS nw,
         {md5_long_sql('s.seg')} AS gh
  FROM (
    SELECT doc_id,
           unnest([struct_pack(
                     seg_idx := CAST(k AS BIGINT),
                     seg := array_to_string(list_slice(ws, k * {n} + 1, k * {n} + {n}), ' '),
                     nw := CAST(len(list_slice(ws, k * {n} + 1, k * {n} + {n})) AS BIGINT))
                   for k in generate_series(0, (len(ws) - 1) // {n})]) AS s
    FROM w WHERE len(ws) > 0
  )
), packed AS (
  SELECT doc_id, nw, gh,
         CASE WHEN seg_idx < {_SEG_PACK} THEN doc_id * {_SEG_PACK} + seg_idx
              ELSE error('segment index exceeds packing radix 2^20') END AS pk
  FROM seg
), marked AS (
  SELECT doc_id, nw,
         CASE WHEN pk = min(pk) OVER (PARTITION BY gh)
              THEN 1 ELSE 0 END AS kept
  FROM packed
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_segments,
       CAST(sum(kept) AS BIGINT) AS n_kept_segments,
       CAST(sum(nw) AS BIGINT) AS n_words_total,
       CAST(sum(nw * kept) AS BIGINT) AS n_words_kept
FROM marked GROUP BY doc_id
"""


def sorted_neighborhood_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_len: int = 40,
    block_len: int = 8,
    window: int = 2,
    max_dist: int = 25,
) -> DataFrame:
    """Sorted-neighborhood near-dup candidate pairs (Hernandez & Stolfo's
    SNM) -- the LINEAR-scan companion to the quadratic
    :func:`editdistance_pairs`: sort records by a normalized key (lower +
    first ``prefix_len`` chars), compare each record only to its
    ``window`` predecessors in sort order, keep pairs with Levenshtein
    distance <= ``max_dist``. Output (id_a, id_b, dist), id_a < id_b.

    Gated since round 7 (catalog name dedup_sorted_neighborhood).

    Scale shape (100 TB): the sort is confined to key-prefix blocks
    (``block_len`` chars) -- Window.partitionBy(block).orderBy(key, id)
    is one shuffle with in-partition sort, and per-record cost is
    ``window`` Levenshtein comparisons instead of |block| (the SNM
    point). Pairs whose keys differ in the first ``block_len`` chars are
    missed across block boundaries -- the standard blocked-SNM trade,
    same confinement discipline as editdistance_pairs' (lang, source)
    blocks; production runs multiple passes with varied keys. Exact dups
    share the full key, hence the block, so they are never missed."""
    d = docs.select(
        F.col(id_col).alias("id"),
        F.lower(F.substring(F.col(text_col), 1, prefix_len)).alias("k"),
    ).withColumn("blk", F.substring(F.col("k"), 1, block_len))
    w = Window.partitionBy("blk").orderBy("k", "id")
    # ONE window pass computing every offset's lag, predecessors exploded
    # per row -- the per-offset union form re-ran the blocked sort once
    # per offset (CLAUDE.md twice-consumed rule)
    with_lags = d.select(
        "id",
        "k",
        *[
            c
            for off in range(1, window + 1)
            for c in (
                F.lag("id", off).over(w).alias(f"p_id_{off}"),
                F.lag("k", off).over(w).alias(f"p_k_{off}"),
            )
        ],
    )
    lagged = with_lags.select(
        "id",
        "k",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.col(f"p_id_{off}").alias("p_id"),
                        F.col(f"p_k_{off}").alias("p_k"),
                    )
                    for off in range(1, window + 1)
                ]
            )
        ).alias("p"),
    ).where(F.col("p.p_id").isNotNull())
    out = lagged.select(
        F.least("id", F.col("p.p_id")).alias("id_a"),
        F.greatest("id", F.col("p.p_id")).alias("id_b"),
        F.levenshtein("k", F.col("p.p_k")).cast("bigint").alias("dist"),
    ).where(F.col("dist") <= max_dist)
    # identical keys make the same unordered pair reachable at two offsets
    # (ties broken by id give (x,y) at off 1 and (y,x)-normalized at off 2
    # via a middle row); distinct() keeps the pair relation a set
    return out.distinct()


def sorted_neighborhood_pairs_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_len: int = 40,
    block_len: int = 8,
    window: int = 2,
    max_dist: int = 25,
) -> str:
    """DuckDB twin of :func:`sorted_neighborhood_pairs`: the same lag
    windows over the same blocked sort order."""
    offs = ", ".join(
        f"lag(id, {o}) OVER w AS p_id_{o}, lag(k, {o}) OVER w AS p_k_{o}"
        for o in range(1, window + 1)
    )
    arms = "\nUNION ALL\n".join(
        f"""SELECT least(id, p_id_{o}) AS id_a, greatest(id, p_id_{o}) AS id_b,
       CAST(levenshtein(k, p_k_{o}) AS BIGINT) AS dist
FROM lagged WHERE p_id_{o} IS NOT NULL AND levenshtein(k, p_k_{o}) <= {max_dist}"""
        for o in range(1, window + 1)
    )
    return f"""
WITH d AS (
  SELECT {id_col} AS id, lower(substr({text_col}, 1, {prefix_len})) AS k,
         substr(lower(substr({text_col}, 1, {prefix_len})), 1, {block_len}) AS blk
  FROM {table}
),
lagged AS (
  SELECT id, k, {offs}
  FROM d WINDOW w AS (PARTITION BY blk ORDER BY k, id)
)
SELECT DISTINCT id_a, id_b, dist FROM (
{arms}
)
"""

def prefix_filter_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
) -> DataFrame:
    """EXACT set-similarity self-join with prefix filtering (Bayardo et
    al.'s AllPairs / Xiao et al.'s PPJoin) over the md5-hashed word
    n-gram space: every unordered pair of documents whose n-gram-set
    Jaccard is >= threshold_num/threshold_den, with NO false negatives
    and NO approximation. This is the FULL-CORPUS scale path for the
    similarity space :func:`ngram_jaccard_pairs` computes quadratically
    within a shard -- same grams, same threshold, no partition
    confinement. Output (id_a, id_b, inter_size, union_size), id_a <
    id_b, all BIGINT (the threshold test is integer cross-multiplied, so
    the pair set is hash-exact across engines).

    Gated since round 7 (catalog name dedup_prefix_filter_jaccard).

    How it avoids all-pairs: order the gram universe by (global document
    frequency ASC, hash ASC) -- rarest first. A document with s distinct
    grams needs overlap >= ceil(t*s) with any qualifying partner, so by
    pigeonhole the pair must share one of each side's first
    p = s - ceil(t*s) + 1 grams under that order (the prefix-filtering
    principle). Only prefixes enter the candidate join, and the
    frequency ordering makes prefix grams RARE, so posting lists stay
    short; a length filter (den*min_size >= num*max_size, implied by
    J >= t) prunes further. Verification recomputes the exact
    intersection on the full gram sets, so each engine's candidate
    superset is irrelevant to the output -- only the no-false-negative
    guarantee matters, and that holds per engine for ANY consistent
    total order. (On a near-flat frequency profile -- e.g. CHAR shingles
    of this synthetic corpus, 2k distinct shingles across 5k docs --
    prefix filtering cannot prune and the join degrades toward all-pairs;
    the word n-gram space is ~100x sparser, which is what makes this the
    right exact-join space. Same reason the dedup literature runs
    AllPairs on token sets, not character sets.)

    Scale shape (100 TB): one shuffle to count gram frequencies, one
    windowed shuffle on doc id for the per-doc rank, a candidate
    equi-join keyed on PREFIX grams only (the short postings), and a
    verify join on doc id. Unlike banded LSH there is no recall curve to
    argue about -- the output is the ground truth itself; the price is
    the frequency-counting pass, which LSH avoids. The hashed-gram frame
    feeds four consumers (frequency count, prefix rank, both verify
    sides), so it is localCheckpoint-ed once (round-6 twice-consumed
    rule)."""
    from ..sources.loaders import widen_scan

    tn, td = threshold_num, threshold_den
    words = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        )
    )
    hashed = F.array_distinct(F.transform(grams, _md5_long_c))
    hs_tbl = (
        widen_scan(docs)
        .select(F.col(id_col).alias("id"), hashed.alias("hs"))
        .localCheckpoint()
    )
    exploded = hs_tbl.select(
        "id", F.size("hs").cast("bigint").alias("s"), F.explode("hs").alias("h")
    )
    freq = exploded.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("id").orderBy("c", "h")
    ranked = exploded.join(freq, "h").select(
        "id", "s", "h", F.row_number().over(w).alias("rn")
    )
    # p = s - ceil(t*s) + 1; integer ceil via (tn*s + td - 1) DIV td
    prefix = ranked.where(
        F.col("rn") <= F.col("s") - F.expr(f"({tn}*s + {td - 1}) DIV {td}") + 1
    ).select("id", "s", "h")
    a = prefix.select(F.col("id").alias("id_a"), F.col("s").alias("s_a"), "h")
    b = prefix.select(F.col("id").alias("id_b"), F.col("s").alias("s_b"), "h")
    cand = (
        a.join(b, "h")
        .where(
            (F.col("id_a") < F.col("id_b"))
            # length filter: J >= t forces min >= t*max on set sizes
            & (F.least("s_a", "s_b") * td >= F.greatest("s_a", "s_b") * tn)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    sa = hs_tbl.select(F.col("id"), F.col("hs").alias("hs_a"))
    sb = hs_tbl.select(F.col("id"), F.col("hs").alias("hs_b"))
    verified = (
        cand.join(sa, F.col("id_a") == sa["id"])
        .drop("id")
        .join(sb, F.col("id_b") == sb["id"])
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("hs_a", "hs_b")).cast("bigint").alias("inter"),
            (F.size("hs_a") + F.size("hs_b")).cast("bigint").alias("tot"),
        )
    )
    # J = i/(tot-i) >= tn/td  <=>  (td+tn)*i >= tn*tot, integer-exact
    return verified.where((td + tn) * F.col("inter") >= tn * F.col("tot")).select(
        "id_a",
        "id_b",
        F.col("inter").alias("inter_size"),
        (F.col("tot") - F.col("inter")).alias("union_size"),
    )


def prefix_filter_jaccard_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
) -> str:
    """DuckDB twin of :func:`prefix_filter_jaccard_pairs`: the same
    frequency-ordered prefixes, candidate join, and integer-exact verify.
    (`//` is DuckDB's integer division where Spark spells it DIV.)"""
    tn, td = threshold_num, threshold_den
    words = f"[x for x in string_split_regex(lower({text_col}), '\\s+') if x != '']"
    return f"""
WITH sh AS MATERIALIZED (
  SELECT id, list_distinct([{md5_long_sql('x')} for x in gs]) AS hs
  FROM (
    SELECT {id_col} AS id,
           list_distinct([array_to_string(w[i:i+{n - 1}], ' ')
                          for i in generate_series(1, greatest(len(w) - {n - 1}, 1))]) AS gs
    FROM (SELECT {id_col}, {words} AS w FROM {table})
  )
),
expl AS (
  SELECT id, CAST(len(hs) AS BIGINT) AS s, unnest(hs) AS h FROM sh
),
freq AS (SELECT h, count(*) AS c FROM expl GROUP BY 1),
ranked AS (
  SELECT id, s, h, row_number() OVER (PARTITION BY id ORDER BY c, h) AS rn
  FROM expl JOIN freq USING (h)
),
pref AS (
  SELECT id, s, h FROM ranked WHERE rn <= s - (({tn}*s + {td - 1}) // {td}) + 1
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM pref a JOIN pref b
    ON a.h = b.h AND a.id < b.id
   AND least(a.s, b.s) * {td} >= greatest(a.s, b.s) * {tn}
),
verified AS (
  SELECT id_a, id_b,
         CAST(len(list_intersect(sa.hs, sb.hs)) AS BIGINT) AS inter,
         CAST(len(sa.hs) + len(sb.hs) AS BIGINT) AS tot
  FROM cand JOIN sh sa ON id_a = sa.id JOIN sh sb ON id_b = sb.id
)
SELECT id_a, id_b, inter AS inter_size, tot - inter AS union_size
FROM verified WHERE ({td} + {tn}) * inter >= {tn} * tot
"""

# Fellegi-Sunter agreement weights (integer log-odds stand-ins; the
# m/u-probability-estimated weights need EM and are a modeling choice --
# these fixed integers keep the DECISION MODEL exercisable and the
# output exactly deterministic cross-engine).
FS_WEIGHTS = {
    "len": (4, -1, 10),  # (agree, disagree, |n_chars| tolerance)
    "prefix": (6, -2, 20),  # (agree, disagree, prefix chars)
    "tokens": (3, -1, 2),  # (agree, disagree, |token count| tolerance)
}
FS_MATCH_T = 10
FS_POSSIBLE_T = 4


def fs_pair_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    length_col: str = "n_chars",
    block_cols: tuple[str, ...] = ("lang", "source"),
) -> DataFrame:
    """Blocked Fellegi-Sunter pair scores -- the shared pair stage under
    :func:`record_linkage_scores` (per-block decision profile) and
    :func:`entity_resolution_clusters` (linked-entity closure). Output
    (block..., id_a, id_b, score): one row per blocked candidate pair
    (id_a < id_b), score = the summed integer agreement weights over the
    three comparison fields (length band, text prefix, token count).

    Scale shape (100 TB): the per-doc feature projection runs once and
    is localCheckpoint-ed (it feeds BOTH sides of the self-join -- the
    MinHash persisted-signature rule); the quadratic is confined to
    (lang, source) blocks exactly like editdistance_pairs, one equi-join
    shuffle with blocks co-located."""
    from ..sources.loaders import widen_scan

    la, ld, ltol = FS_WEIGHTS["len"]
    pa, pd_, plen = FS_WEIGHTS["prefix"]
    ta, td, ttol = FS_WEIGHTS["tokens"]
    words = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
    feats = (
        widen_scan(docs)
        .select(
            *[F.col(c) for c in block_cols],
            F.col(id_col).alias("id"),
            F.col(length_col).cast("bigint").alias("len"),
            F.lower(F.substring(F.col(text_col), 1, plen)).alias("pfx"),
            F.size(words).cast("bigint").alias("ntok"),
        )
        .localCheckpoint()
    )
    a, b = feats.alias("a"), feats.alias("b")
    cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols] + [
        F.col("a.id") < F.col("b.id")
    ]
    score = (
        F.when(F.abs(F.col("a.len") - F.col("b.len")) <= ltol, F.lit(la)).otherwise(
            F.lit(ld)
        )
        + F.when(F.col("a.pfx") == F.col("b.pfx"), F.lit(pa)).otherwise(F.lit(pd_))
        + F.when(F.abs(F.col("a.ntok") - F.col("b.ntok")) <= ttol, F.lit(ta)).otherwise(
            F.lit(td)
        )
    )
    return a.join(b, cond).select(
        *[F.col(f"a.{c}").alias(c) for c in block_cols],
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        score.cast("bigint").alias("score"),
    )


def record_linkage_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    length_col: str = "n_chars",
    block_cols: tuple[str, ...] = ("lang", "source"),
) -> DataFrame:
    """Fellegi-Sunter-style probabilistic record linkage over blocked
    candidate pairs: per pair, each comparison field (length band, text
    prefix, token count) contributes an agreement/disagreement weight,
    the summed score classifies the pair match / possible / non_match
    (the classic two-threshold decision model). Output is the per-block
    DECISION PROFILE -- (block..., decision, n_pairs, sum_score) -- the
    review-queue sizing a linkage pipeline actually reports; pair-level
    output is editdistance_pairs' job.

    GATED ROUND 9 (promoted from the staged backlog).

    Determinism: every weight is a fixed integer (FS_WEIGHTS; the
    EM-estimated log-odds of the full Fellegi-Sunter model are a
    modeling layer deliberately left out), agreements are integer/string
    comparisons, so scores and classes are exactly equal cross-engine.

    Scale shape (100 TB): the per-doc feature projection runs once and is
    localCheckpoint-ed (it feeds BOTH sides of the self-join -- the
    MinHash persisted-signature rule); the quadratic is confined to
    (lang, source) blocks exactly like editdistance_pairs, one equi-join
    shuffle with blocks co-located; the decision profile folds with
    map-side partials to a vocabulary-bounded relation."""
    decision = (
        F.when(F.col("score") >= FS_MATCH_T, F.lit("match"))
        .when(F.col("score") >= FS_POSSIBLE_T, F.lit("possible"))
        .otherwise(F.lit("non_match"))
    )
    return (
        fs_pair_scores(docs, id_col, text_col, length_col, block_cols)
        .select(*block_cols, "score", decision.alias("decision"))
        .groupBy(*block_cols, "decision")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum("score").cast("bigint").alias("sum_score"),
        )
    )


def _fs_sql_parts(
    table: str,
    id_col: str,
    text_col: str,
    length_col: str,
    block_cols: tuple[str, ...],
) -> dict:
    """Shared SQL fragments under the two Fellegi-Sunter oracles
    (record_linkage_scores_sql, entity_resolution_clusters_sql) -- the
    oracle-side single source of truth mirroring :func:`fs_pair_scores`
    on the Spark side: the feats CTE body, the integer score expression
    over aliases a/b, and the blocked join condition."""
    la, ld, ltol = FS_WEIGHTS["len"]
    pa, pd_, plen = FS_WEIGHTS["prefix"]
    ta, td, ttol = FS_WEIGHTS["tokens"]
    blk = ", ".join(block_cols)
    words = (
        f"[x for x in string_split_regex(lower({text_col}), '\\s+') if x != '']"
    )
    feats = f"""SELECT {blk}, {id_col} AS id, CAST({length_col} AS BIGINT) AS len,
         lower(substr({text_col}, 1, {plen})) AS pfx,
         CAST(len({words}) AS BIGINT) AS ntok
  FROM {table}"""
    score = f"""CAST(CASE WHEN abs(a.len - b.len) <= {ltol} THEN {la} ELSE {ld} END
            + CASE WHEN a.pfx = b.pfx THEN {pa} ELSE {pd_} END
            + CASE WHEN abs(a.ntok - b.ntok) <= {ttol} THEN {ta} ELSE {td} END
           AS BIGINT)"""
    join_on = " AND ".join(f"a.{c} = b.{c}" for c in block_cols)
    return {"feats": feats, "score": score, "join_on": join_on}


def record_linkage_scores_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    length_col: str = "n_chars",
    block_cols: tuple[str, ...] = ("lang", "source"),
) -> str:
    """DuckDB twin of :func:`record_linkage_scores`: same blocked
    self-join, same integer weights and thresholds (shared fragments:
    :func:`_fs_sql_parts`)."""
    parts = _fs_sql_parts(table, id_col, text_col, length_col, block_cols)
    blk = ", ".join(block_cols)
    blk_a = ", ".join(f"a.{c} AS {c}" for c in block_cols)
    return f"""
WITH feats AS (
  {parts["feats"]}
),
scored AS (
  SELECT {blk_a},
         {parts["score"]} AS score
  FROM feats a JOIN feats b ON {parts["join_on"]} AND a.id < b.id
)
SELECT {blk},
       CASE WHEN score >= {FS_MATCH_T} THEN 'match'
            WHEN score >= {FS_POSSIBLE_T} THEN 'possible'
            ELSE 'non_match' END AS decision,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(score) AS BIGINT) AS sum_score
FROM scored GROUP BY {blk}, decision
"""


def entity_resolution_clusters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    length_col: str = "n_chars",
    block_cols: tuple[str, ...] = ("lang", "source"),
    link_threshold: int | None = None,
) -> DataFrame:
    """Entity resolution: the Fellegi-Sunter pair stage closed into
    canonical entities -- link every blocked pair scoring at or above
    ``link_threshold`` (default FS_POSSIBLE_T: the optimistic
    possible-or-match closure a review pipeline sizes its entity table
    with; FS_MATCH_T gives the conservative auto-link closure), take
    connected components, and assign every record its component's
    minimum id as the entity id (singletons are their own entity).
    Output (doc_id, entity_id, entity_size), all BIGINT -- the
    record -> golden-entity mapping that master-data/dedup pipelines
    materialize and join everywhere downstream.

    GATED ROUND 9 (promoted from the staged backlog).

    Scale shape (100 TB): pair generation is the blocked
    :func:`fs_pair_scores` equi-join (quadratic confined to blocks);
    the closure is alternating large-star/small-star (O(log n) rounds,
    see :func:`~.graph.connected_components` -- NOT a recursive join);
    singleton attach + sizing are two hash joins and one groupBy on the
    entity key. The oracle walks the same closure with a recursive CTE,
    fine at oracle scale."""
    from . import graph

    thr = FS_POSSIBLE_T if link_threshold is None else link_threshold
    pairs = (
        fs_pair_scores(docs, id_col, text_col, length_col, block_cols)
        .where(F.col("score") >= thr)
        .select("id_a", "id_b")
    )
    comp = graph.connected_components(pairs)
    ent = (
        docs.select(F.col(id_col).cast("bigint").alias("id"))
        .join(comp, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("comp"), F.col("id")).cast("bigint").alias("entity_id"),
        )
    )
    sizes = ent.groupBy("entity_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("entity_size")
    )
    return ent.join(sizes, "entity_id").select(id_col, "entity_id", "entity_size")


def entity_resolution_clusters_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    length_col: str = "n_chars",
    block_cols: tuple[str, ...] = ("lang", "source"),
    link_threshold: int | None = None,
) -> str:
    """DuckDB twin of :func:`entity_resolution_clusters`: the shared
    record_linkage feature/score fragments (:func:`_fs_sql_parts`),
    links at the same threshold, recursive-CTE closure (the
    minhash_clusters_sql precedent), same min-id canonicalization and
    singleton attach."""
    thr = FS_POSSIBLE_T if link_threshold is None else link_threshold
    parts = _fs_sql_parts(table, id_col, text_col, length_col, block_cols)
    return f"""
WITH RECURSIVE feats AS (
  {parts["feats"]}
),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM feats a JOIN feats b ON {parts["join_on"]} AND a.id < b.id
  WHERE {parts["score"]} >= {thr}
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
),
walk(id, comp) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.v, w.comp FROM walk w JOIN edges e ON e.u = w.id
),
cmap AS (SELECT id, min(comp) AS comp FROM walk GROUP BY id),
ent AS (
  SELECT d.{id_col} AS {id_col},
         CAST(COALESCE(c.comp, d.{id_col}) AS BIGINT) AS entity_id
  FROM {table} d LEFT JOIN cmap c ON c.id = d.{id_col}
),
sizes AS (
  SELECT entity_id, CAST(count(*) AS BIGINT) AS entity_size
  FROM ent GROUP BY 1
)
SELECT ent.{id_col}, ent.entity_id, sizes.entity_size
FROM ent JOIN sizes USING (entity_id)
"""
