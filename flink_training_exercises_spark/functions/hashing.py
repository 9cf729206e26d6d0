"""Cross-engine deterministic hashing.

The dedup / fingerprint / LSH operators need hash functions that produce the
SAME value in Spark and in the DuckDB oracle (the driver hash-compares query
outputs). Spark's ``hash()``/``xxhash64`` and DuckDB's ``hash()`` are
different algorithms, so everything here goes through md5 -- identical bytes
in both engines -- then takes the first 15 hex digits as a non-negative
60-bit integer:

    Spark : CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)
    DuckDB: CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)

Universal-hash family for MinHash permutations:
    h_i(x) = ((a_i * (x % P) + b_i) % P)   with P = 2^31 - 1
(a_i, b_i drawn once from a seeded PRNG and embedded as literals -- same
constants in the SQL oracle via ``plans`` fragments).

At 100 TB this stays fully JVM-side (md5 + conv are codegen'd expressions);
no Python in the hot path.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = (1 << 31) - 1
_HASH_SEED = 0x5EED


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def md5_long(col) -> Column:
    """Deterministic non-negative 60-bit integer hash of a string column."""
    return F.conv(F.substring(F.md5(_c(col)), 1, 15), 16, 10).cast("bigint")


def md5_long_sql(expr: str) -> str:
    """DuckDB twin of :func:`md5_long` (same value, bit for bit)."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def hash_params(k: int, seed: int = _HASH_SEED) -> list[tuple[int, int]]:
    """k (a, b) pairs for the universal hash family, deterministic by seed."""
    rng = random.Random(seed)
    return [(rng.randrange(1, MERSENNE_P), rng.randrange(0, MERSENNE_P)) for _ in range(k)]


def permuted_hash(base_hash, a: int, b: int) -> Column:
    """h_i(x) = (a * (x % P) + b) % P over a bigint Column (no overflow:
    both factors < 2^31, product < 2^62)."""
    x = _c(base_hash) % F.lit(MERSENNE_P)
    return (F.lit(a) * x + F.lit(b)) % F.lit(MERSENNE_P)


def permuted_hash_sql(base_expr: str, a: int, b: int) -> str:
    """DuckDB twin of :func:`permuted_hash`."""
    return f"(({a} * (({base_expr}) % {MERSENNE_P}) + {b}) % {MERSENNE_P})"
