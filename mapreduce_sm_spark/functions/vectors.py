"""Vector math over array<float> embedding columns — pure column expressions.

`F.zip_with` + `F.aggregate` compile to codegen'd loops over the array —
no Python in the hot path. Accumulation is left-to-right in index order in
both Spark and DuckDB's list_* kernels, so double-precision results agree
bit-for-bit with the oracle; top-k / threshold comparisons additionally
round to 6 decimals to be safe at decision boundaries.

Scale note (100 TB): brute-force cosine is the *baseline*; the scale path is
LSH bucketing (operators/similarity.py) which prunes the candidate set
before any distance is computed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<numeric> columns (double)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    prod = F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    sq = F.aggregate(
        ca, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    return F.sqrt(sq)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity (double); NaN-free for zero vectors via nullif."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    denom = l2_norm(ca) * l2_norm(cb)
    return dot(ca, cb) / F.nullif(denom, F.lit(0.0))


# ---- DuckDB oracle renderings ------------------------------------------
# DuckDB's list_cosine_similarity uses float32 accumulation internally in
# some versions; to guarantee parity we spell out the same double-precision
# fold the Spark expressions use.

def dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"p -> (p[1]::DOUBLE) * (p[2]::DOUBLE)), (x, y) -> x + y)"
    )


def norm_sql(a: str) -> str:
    return f"sqrt(list_reduce(list_transform({a}, v -> (v::DOUBLE)*(v::DOUBLE)), (x, y) -> x + y))"


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / nullif({norm_sql(a)} * {norm_sql(b)}, 0.0))"
