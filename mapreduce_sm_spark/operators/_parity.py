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
