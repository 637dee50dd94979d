"""Z-order (Morton) interleaving for multi-dimensional data layout.

Why: min/max data skipping (parquet row-group stats, file pruning) only
prunes on the column the data is SORTED by — a layout sorted by date
leaves every file spanning the full customer range, so a customer-keyed
scan reads everything. Interleaving the bits of two columns and sorting
by the interleaved value keeps BOTH columns' per-file ranges narrow, so
selective filters on either column skip most files. This is the classic
space-filling-curve layout (public: the Morton/Z-curve construction and
the magic-mask bit-spreading sequence are textbook; cf. Delta Lake's
OPTIMIZE ZORDER BY which applies the same idea).

The engine has no custom file format, so z-ordering here is a WRITE-TIME
transform over plain parquet: repartitionByRange + sortWithinPartitions
on the z-value (`zorder_frame`), which any Spark cluster executes as one
range-partitioned sort. The z-value itself is closed-form integer
arithmetic rendered from ONE shared SQL text (`zvalue_sql`) valid in
both Spark SQL and DuckDB — multiplications instead of shifts, so the
identical string runs on both engines and the oracle gate can check the
curve math bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16 bits per dimension -> 32-bit z-values: enough for layout bucketing
# (values are masked into range first; layout quality needs relative
# order, not full key width)
_MASKS = (
    (256, 0x00FF00FF),  # spread bytes:    x | x<<8  & ...
    (16, 0x0F0F0F0F),   # spread nibbles:  x | x<<4  & ...
    (4, 0x33333333),    # spread pairs:    x | x<<2  & ...
    (2, 0x55555555),    # spread bits:     x | x<<1  & ...
)


def _spread_sql(expr: str) -> str:
    """SQL text spreading the low 16 bits of `expr` onto even bit
    positions. Multiplication stands in for left-shift so the same text
    parses in Spark SQL and DuckDB; the BIGINT cast keeps DuckDB from
    running the arithmetic in INT32 (where the final *2 overflows)."""
    s = f"(CAST({expr} AS BIGINT) & 65535)"
    for mul, mask in _MASKS:
        s = f"((({s}) | (({s}) * {mul})) & {mask})"
    return s


def zvalue_sql(a_expr: str, b_expr: str) -> str:
    """Engine-portable SQL for the 32-bit Morton interleave of two
    expressions' low 16 bits (a on even bits, b on odd bits)."""
    return f"({_spread_sql(a_expr)} | ({_spread_sql(b_expr)} * 2))"


def zvalue(a_expr: str, b_expr: str) -> Column:
    """Spark Column form of zvalue_sql (same text, F.expr'd)."""
    return F.expr(zvalue_sql(a_expr, b_expr))


def zvalue_py(a: int, b: int) -> int:
    """Pure-Python reference for tests: bit-interleave low 16 bits."""

    def spread(x: int) -> int:
        x &= 0xFFFF
        x = (x | (x << 8)) & 0x00FF00FF
        x = (x | (x << 4)) & 0x0F0F0F0F
        x = (x | (x << 2)) & 0x33333333
        x = (x | (x << 1)) & 0x55555555
        return x

    return spread(a) | (spread(b) << 1)


def zorder_frame(
    df: DataFrame, a_expr: str, b_expr: str, num_files: int
) -> DataFrame:
    """Lay `df` out along the z-curve of (a_expr, b_expr): range-partition
    into num_files splits of the z-value and sort within each, so a
    subsequent parquet write produces files whose min/max are narrow in
    BOTH dimensions.

    Each dimension is min-max scaled onto the full 16-bit grid first —
    interleaving RAW values lets whichever dimension has the larger
    magnitude own all the high z-bits, and the range splits then cut
    almost exclusively along that dimension (measured: a date column in
    the tens-of-thousands of days reduced custkey skipping to 1 file in
    8). The two min/max aggregates are one tiny extra job over a
    broadcast row — the curve itself still costs exactly one range
    exchange + local sort, the same as any total-order write."""
    a = F.expr(a_expr).cast("long")
    b = F.expr(b_expr).cast("long")
    tagged = df.withColumn("__za", a).withColumn("__zb", b)
    bounds = tagged.agg(
        F.min("__za").alias("__amin"),
        F.max("__za").alias("__amax"),
        F.min("__zb").alias("__bmin"),
        F.max("__zb").alias("__bmax"),
    )
    norm_a = "((__za - __amin) * 65535 DIV greatest(__amax - __amin, 1))"
    norm_b = "((__zb - __bmin) * 65535 DIV greatest(__bmax - __bmin, 1))"
    return (
        tagged.crossJoin(F.broadcast(bounds))
        .withColumn("__z", F.expr(zvalue_sql(norm_a, norm_b)))
        .repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z", "__za", "__zb", "__amin", "__amax", "__bmin", "__bmax")
    )
