"""Helpers that keep Spark results bit-identical to the DuckDB oracle.

Floating-point SUM over a shuffled dataset is order-dependent, and Spark's
partial aggregation order is nondeterministic — so money aggregates are
summed as DECIMAL(18,2) (exact, order-independent) and only then cast back
to DOUBLE. Both engines perform the identical double->decimal(2) rounding
per input value, so results match exactly at any scale factor.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_sum(col: Column | str) -> Column:
    """Order-independent exact sum of a money-like double column -> double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(18,2)")).cast("double")


def money_sum_sql(expr: str) -> str:
    # decimal -> varchar -> double: DuckDB's direct decimal::DOUBLE cast
    # multiplies by an inexact power-of-ten reciprocal and can be off by one
    # ulp vs Spark's correctly-rounded BigDecimal.doubleValue(); the string
    # route is correctly rounded in both engines.
    return f"(CAST(sum(CAST({expr} AS DECIMAL(18,2))) AS VARCHAR))::DOUBLE"


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount) computed entirely in decimal
    domain. Casting the *base* columns (clean 2/4-decimal values, far from
    rounding boundaries) is engine-agnostic; multiplying afterwards is exact
    decimal arithmetic — so Spark and DuckDB agree bit-for-bit, unlike a
    double product cast to decimal (tie-rounding differs)."""
    ep = F.col("l_extendedprice").cast("decimal(12,2)")
    d1 = F.lit(1).cast("decimal(6,4)") - F.col("l_discount").cast("decimal(6,4)")
    return ep * d1


DISC_PRICE_SQL = (
    "(CAST(l_extendedprice AS DECIMAL(12,2)) * "
    "(CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4))))"
)


def charge() -> Column:
    """disc_price * (1 + l_tax), decimal domain throughout."""
    t1 = F.lit(1).cast("decimal(6,4)") + F.col("l_tax").cast("decimal(6,4)")
    return disc_price() * t1


CHARGE_SQL = (
    f"({DISC_PRICE_SQL} * "
    "(CAST(1 AS DECIMAL(6,4)) + CAST(l_tax AS DECIMAL(6,4))))"
)


def decimal_sum(col: Column) -> Column:
    """Exact order-independent sum of an already-decimal column -> double."""
    return F.sum(col).cast("double")


def decimal_sum_sql(expr: str) -> str:
    return f"(CAST(sum({expr}) AS VARCHAR))::DOUBLE"


def exact_avg(col: Column | str) -> Column:
    """Order-independent mean: exact decimal sum divided as doubles."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast("decimal(18,4)")).cast("double")
        / F.count(c).cast("double")
    )


def exact_avg_sql(expr: str) -> str:
    return (
        f"((CAST(sum(CAST({expr} AS DECIMAL(18,4))) AS VARCHAR))::DOUBLE"
        f" / (count({expr}))::DOUBLE)"
    )


def ts_str(col: Column | str) -> Column:
    """Render a timestamp as 'yyyy-MM-dd HH:mm:ss' (string) so hashed
    comparisons are representation-independent."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss")


def ts_str_sql(expr: str) -> str:
    return f"strftime({expr}, '%Y-%m-%d %H:%M:%S')"


def date_str(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd")


def date_str_sql(expr: str) -> str:
    return f"strftime({expr}, '%Y-%m-%d')"


# ---------------------------------------------------------------------------
# Two-phase scaled-int64 aggregation: the fast path for money sums.
#
# Stage 1 sums scaled-integer money per (group, input partition) in pure
# int64 inside whole-stage codegen (no per-row BigDecimal); stage 2 merges
# the per-partition partials in decimal — exact for any partition count —
# and converts to double once. Bit-identical to summing DECIMAL directly
# (what the oracles compute), ~2x faster per aggregate column.
#
# Overflow headroom: an input partition is <= ~4M rows (128 MB splits);
# callers pass per-row longs bounded <= ~1e11 (1e6-scaled money products),
# so partition subtotals stay <= ~4e17, far under 2^63. Larger-scaled
# terms must be split by the caller (see q1's charge div/mod 1e6 split).
# ---------------------------------------------------------------------------


def money_cents(col: Column | str) -> Column:
    """Exact 1e2-scaled int64 of a clean 2-decimal money double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def disc_price_long() -> Column:
    """l_extendedprice*(1-l_discount) as an exact 1e6-scaled int64
    (<= ~1e11 per row)."""
    ep_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    d4 = F.round(F.col("l_discount") * 10000).cast("long")
    return ep_c * (F.lit(10000) - d4)


def two_phase_sums(df, group_cols, sums, extra_final=()):
    """groupBy(group_cols) with exact two-phase int64 money sums.

    sums: {alias: (long_col, scale)} — per-row exact scaled integers.
    extra_final: additional (already aggregate) columns evaluated in the
    final stage over the partials, e.g. F.sum("_n_") counts. A count
    partial "_n_" is always available.
    """
    partial_aggs = [
        F.sum(col).alias(f"_s_{alias}") for alias, (col, _) in sums.items()
    ]
    partial_aggs.append(F.count("*").alias("_n_"))
    partials = df.groupBy(
        *group_cols, F.spark_partition_id().alias("_p_")
    ).agg(*partial_aggs)
    final_aggs = [
        (F.sum(F.col(f"_s_{alias}").cast("decimal(38,0)")) / F.lit(scale))
        .cast("double")
        .alias(alias)
        for alias, (_, scale) in sums.items()
    ]
    final_aggs.extend(extra_final)
    return partials.groupBy(*group_cols).agg(*final_aggs)
