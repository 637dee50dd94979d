"""Portable deterministic hashing shared by Spark plans and the DuckDB oracle.

The reference partitions its shuffle with a djb2 string hash
(/root/reference/src/mapreduce.c:41-50). Spark's own shuffle hash replaces
that role entirely; what WE need hashing for is content-addressed operators
(MinHash, SimHash, LSH buckets, fingerprints) whose results must be
bit-identical between the Spark implementation and the DuckDB oracle.

Neither engine's native hash (xxhash64 vs duckdb hash) matches the other,
but both compute md5 identically, so the portable primitive is:

    hash60(s) = int(hex(md5(s))[:15], 16)        # 60 bits, fits in int64

Spark :  conv(substring(md5(s), 1, 15), 16, 10) cast to long
DuckDB:  ('0x' || substr(md5(s), 1, 15))::BIGINT

md5 costs more than xxhash but these operators hash short shingles/tokens;
at 100 TB the cost is dominated by the shuffle the hashes feed, not the
hashing itself. A salt string gives independent hash families for MinHash
permutations and LSH bands.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^61 - 1 (Mersenne prime) — modulus for permutation arithmetic that stays
# comfortably inside int64 even after adding offsets.
MERSENNE_61 = (1 << 61) - 1


def hash60(col: Column | str, salt: str = "") -> Column:
    """60-bit non-negative deterministic hash of a string column."""
    c = F.col(col) if isinstance(col, str) else col
    if salt:
        c = F.concat(F.lit(salt), F.lit("|"), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str, salt: str = "") -> str:
    """The DuckDB-SQL rendering of hash60 over an arbitrary SQL expression."""
    inner = f"'{salt}' || '|' || ({expr})" if salt else f"({expr})"
    return f"('0x' || substr(md5({inner}), 1, 15))::BIGINT"


def hash60_py(s: str, salt: str = "") -> int:
    """Driver-side Python twin of hash60 — used by tests that need the
    exact hash value to construct boundary fixtures (e.g. the digest
    wrap-threshold test) without a Spark round trip."""
    import hashlib

    if salt:
        s = f"{salt}|{s}"
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def minhash_permutation_params(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) coefficients for MinHash permutations
    h_i(x) = (a_i * x + b_i) mod MERSENNE_61, identical for Spark and oracle.

    Uses a fixed LCG rather than `random` so the constants are reproducible
    from the seed alone in any language.
    """
    params = []
    state = seed & 0xFFFFFFFF
    for _ in range(num_perm):
        state = (state * 1103515245 + 12345) & 0x7FFFFFFF
        a = state | 1  # odd, non-zero
        state = (state * 1103515245 + 12345) & 0x7FFFFFFF
        b = state
        params.append((a, b))
    return params
