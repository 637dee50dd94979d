"""Reshaping and statistical aggregates (SURVEY §2.B gaps).

pivot / unpivot / date arithmetic / moment statistics / collection
aggregates / multiset set operations. The reference has none of these
(its only aggregate is a user reduce over collected values,
/root/reference/src/mapreduce.c:307-343).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_sm_spark.operators._parity import (
    date_str,
    date_str_sql,
    money_sum,
    money_sum_sql,
)
from mapreduce_sm_spark.registry import REGISTRY
from mapreduce_sm_spark.session import table

# ---------------------------------------------------------------------------
# PIVOT: order counts per year x priority. Explicit pivot values (the five
# priorities are a fixed domain) — without them Spark needs an extra
# distinct-collect pass over the data before planning; with them the plan
# is a single partial+final aggregate. 100 TB: one shuffle on year.
# ---------------------------------------------------------------------------

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PIV_ALIASES = ["urgent", "high", "medium", "not_specified", "low"]

_PIVOT_ORACLE = f"""
SELECT EXTRACT(year FROM o_orderdate)::BIGINT AS order_year,
       {', '.join(
           f"count(*) FILTER (WHERE o_orderpriority = '{p}') AS {a}"
           for p, a in zip(_PRIORITIES, _PIV_ALIASES)
       )}
FROM orders
GROUP BY 1
ORDER BY order_year
"""


@REGISTRY.register(
    "pivot_orders_by_priority",
    oracle=_PIVOT_ORACLE,
    description="pivot: order counts per year x priority (explicit pivot values)",
    tags=("aggregate", "pivot"),
)
def pivot_orders_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    piv = (
        orders.withColumn("order_year", F.year("o_orderdate").cast("long"))
        .groupBy("order_year")
        .pivot("o_orderpriority", _PRIORITIES)
        .count()
    )
    renamed = piv.select(
        "order_year",
        *[
            F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(a)
            for p, a in zip(_PRIORITIES, _PIV_ALIASES)
        ],
    )
    return renamed.orderBy("order_year")


# ---------------------------------------------------------------------------
# UNPIVOT (melt): wide per-flag sums -> long (flag, measure, value) rows.
# Spark's unpivot is a zero-shuffle narrow op over the aggregated frame.
# ---------------------------------------------------------------------------

_UNPIVOT_ORACLE = f"""
WITH wide AS (
  SELECT l_returnflag,
         {money_sum_sql('l_quantity')} AS sum_qty,
         {money_sum_sql('l_extendedprice')} AS sum_price,
         {money_sum_sql('l_discount')} AS sum_disc
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, measure, value FROM (
  SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM wide
  UNION ALL
  SELECT l_returnflag, 'sum_price', sum_price FROM wide
  UNION ALL
  SELECT l_returnflag, 'sum_disc', sum_disc FROM wide
)
ORDER BY l_returnflag, measure
"""


@REGISTRY.register(
    "unpivot_lineitem_measures",
    oracle=_UNPIVOT_ORACLE,
    description="unpivot/melt: per-flag measure columns to (measure, value) rows",
    tags=("aggregate", "unpivot"),
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        money_sum("l_quantity").alias("sum_qty"),
        money_sum("l_extendedprice").alias("sum_price"),
        money_sum("l_discount").alias("sum_disc"),
    )
    return wide.unpivot(
        ["l_returnflag"],
        ["sum_qty", "sum_price", "sum_disc"],
        "measure",
        "value",
    ).orderBy("l_returnflag", "measure")


# ---------------------------------------------------------------------------
# Date/interval arithmetic surface over orders, aggregated per year so the
# result is tiny at any scale. All date outputs rendered as strings so the
# comparison is representation-independent.
# ---------------------------------------------------------------------------

_DATE_ORACLE = """
SELECT EXTRACT(year FROM o_orderdate)::BIGINT AS order_year,
       EXTRACT(quarter FROM min(o_orderdate))::BIGINT AS first_quarter,
       count(*) AS n_orders,
       strftime(min(o_orderdate), '%Y-%m-%d') AS first_order,
       strftime(max(o_orderdate), '%Y-%m-%d') AS last_order,
       date_diff('day', min(o_orderdate), max(o_orderdate)) AS span_days,
       strftime(date_trunc('month', min(o_orderdate)), '%Y-%m-%d') AS first_month,
       strftime(min(o_orderdate) + INTERVAL 30 DAY, '%Y-%m-%d') AS first_plus_30d
FROM orders
GROUP BY 1
ORDER BY order_year
"""


@REGISTRY.register(
    "date_arithmetic_orders",
    oracle=_DATE_ORACLE,
    description="date extraction, truncation, diff and interval arithmetic",
    tags=("scalar", "date"),
)
def date_arithmetic_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.withColumn("order_year", F.year("o_orderdate").cast("long"))
        .groupBy("order_year")
        .agg(
            F.quarter(F.min("o_orderdate")).cast("long").alias("first_quarter"),
            F.count("*").alias("n_orders"),
            date_str(F.min("o_orderdate")).alias("first_order"),
            date_str(F.max("o_orderdate")).alias("last_order"),
            F.datediff(F.max("o_orderdate"), F.min("o_orderdate"))
            .cast("long")
            .alias("span_days"),
            date_str(F.date_trunc("month", F.min("o_orderdate"))).alias(
                "first_month"
            ),
            date_str(F.date_add(F.min("o_orderdate").cast("date"), 30)).alias(
                "first_plus_30d"
            ),
        )
        .orderBy("order_year")
    )


# ---------------------------------------------------------------------------
# Moment statistics with exact cross-engine parity: stddev/variance/corr
# derived from exact decimal component sums (n, Σx, Σx², Σy, Σy², Σxy), so
# the only float arithmetic is an IDENTICAL final expression in both
# engines — a native stddev_samp would accumulate doubles in
# engine-specific order and drift in the last ulps.
# 100 TB: component sums are algebraic -> single partial+final aggregate,
# one shuffle on the 3-value grouping key.
# ---------------------------------------------------------------------------


def _via_str(e: str) -> str:
    return f"(CAST({e} AS VARCHAR))::DOUBLE"


_STATS_ORACLE = f"""
WITH comp AS (
  SELECT l_returnflag,
         count(*)::DOUBLE AS n,
         {_via_str('sum(CAST(l_quantity AS DECIMAL(18,2)))')} AS sx,
         {_via_str('sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)))')} AS sxx,
         {_via_str('sum(CAST(l_extendedprice AS DECIMAL(18,2)))')} AS sy,
         {_via_str('sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)))')} AS syy,
         {_via_str('sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)))')} AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       n::BIGINT AS n_rows,
       (sxx - sx * sx / n) / (n - 1) AS var_qty,
       sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_qty,
       (sxy - sx * sy / n) / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)) AS corr_qty_price
FROM comp
ORDER BY l_returnflag
"""


@REGISTRY.register(
    "stats_moments_lineitem",
    oracle=_STATS_ORACLE,
    description="variance/stddev/correlation from exact decimal component sums",
    tags=("aggregate", "statistics"),
)
def stats_moments_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    comp = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    var_qty = (sxx - sx * sx / n) / (n - F.lit(1))
    return comp.select(
        "l_returnflag",
        n.cast("long").alias("n_rows"),
        var_qty.alias("var_qty"),
        F.sqrt(var_qty).alias("stddev_qty"),
        (
            (sxy - sx * sy / n)
            / F.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
        ).alias("corr_qty_price"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# Collection aggregates: collect_set with a deterministic rendering (sets
# have no order; sort then join to a string so the comparison is stable).
# ---------------------------------------------------------------------------

_COLLECT_ORACLE = """
SELECT o_orderpriority,
       array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS statuses,
       count(DISTINCT o_orderstatus) AS n_statuses
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@REGISTRY.register(
    "collect_set_statuses",
    oracle=_COLLECT_ORACLE,
    description="collect_set aggregate with deterministic sorted rendering",
    tags=("aggregate", "collection"),
)
def collect_set_statuses(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("o_orderstatus")), ","
            ).alias("statuses"),
            F.countDistinct("o_orderstatus").alias("n_statuses"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Multiset set operations: INTERSECT ALL / EXCEPT ALL keep duplicate
# multiplicity (the plain setops query covers the DISTINCT variants).
# ---------------------------------------------------------------------------

_MULTISET_ORACLE = """
WITH c AS (SELECT c_nationkey AS nk FROM customer),
     s AS (SELECT s_nationkey AS nk FROM supplier)
SELECT 'intersect_all' AS op, nk, count(*) AS n FROM (
  SELECT nk FROM c INTERSECT ALL SELECT nk FROM s
) GROUP BY nk
UNION ALL
SELECT 'except_all', nk, count(*) FROM (
  SELECT nk FROM s EXCEPT ALL SELECT nk FROM c
) GROUP BY nk
ORDER BY op, nk
"""


@REGISTRY.register(
    "setops_multiset",
    oracle=_MULTISET_ORACLE,
    description="INTERSECT ALL / EXCEPT ALL multiset semantics",
    tags=("setop",),
)
def setops_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk")
    )
    supp = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk")
    )
    inter = (
        cust.intersectAll(supp)
        .groupBy("nk")
        .agg(F.count("*").alias("n"))
        .select(F.lit("intersect_all").alias("op"), "nk", "n")
    )
    exc = (
        supp.exceptAll(cust)
        .groupBy("nk")
        .agg(F.count("*").alias("n"))
        .select(F.lit("except_all").alias("op"), "nk", "n")
    )
    return inter.unionAll(exc).orderBy("op", "nk")


# ---------------------------------------------------------------------------
# Generator + gap fill: a month spine built with sequence()+explode (the
# row-generator / UDTF shape) left-joined to per-month order counts, so
# months with zero orders appear explicitly. At scale the spine is tiny
# (one row per month) and broadcasts.
# ---------------------------------------------------------------------------

_SPINE_ORACLE = """
WITH spine AS (
  SELECT unnest(generate_series(DATE '1995-01-01', DATE '1997-12-01',
                                INTERVAL 1 MONTH))::DATE AS month_start
),
per_month AS (
  SELECT date_trunc('month', o_orderdate)::DATE AS m, count(*) AS n
  FROM orders GROUP BY m
)
SELECT strftime(s.month_start, '%Y-%m-%d') AS month_start,
       coalesce(p.n, 0) AS n_orders
FROM spine s LEFT JOIN per_month p ON s.month_start = p.m
ORDER BY month_start
"""


@REGISTRY.register(
    "calendar_spine_orders",
    oracle=_SPINE_ORACLE,
    description="generated month spine (sequence+explode) with zero-filled counts",
    tags=("generator", "join", "date"),
)
def calendar_spine_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("1997-12-01").cast("date"),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("month_start")
    )
    orders = table(spark, sf_dir, "orders")
    per_month = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("m")
    ).agg(F.count("*").alias("n"))
    return (
        F.broadcast(spine)
        .join(per_month, spine.month_start == per_month.m, "left")
        .select(
            date_str("month_start").alias("month_start"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_orders"),
        )
        .orderBy("month_start")
    )
