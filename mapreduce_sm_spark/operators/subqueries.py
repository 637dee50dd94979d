"""Subquery-shaped queries (SURVEY §2.B: the reference has no joins at all,
so every subquery decorrelation here is net-new capability).

Spark expresses these as joins directly — which is exactly what Catalyst's
RewritePredicateSubquery does to EXISTS/IN, so the DataFrame form IS the
post-optimization shape of the SQL form. Scale notes per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_sm_spark.operators._parity import (
    decimal_sum,
    decimal_sum_sql,
    exact_avg,
    exact_avg_sql,
)
from mapreduce_sm_spark.registry import REGISTRY
from mapreduce_sm_spark.session import table

# ---------------------------------------------------------------------------
# EXISTS (TPC-H Q4 shape, adapted to the fixture's columns): count orders
# per priority having at least one discounted line item.
# 100 TB: left-semi join on the (orders, lineitem) keys — semi join never
# duplicates the probe side, and the discount filter is pushed below the
# join into the lineitem scan (PushedFilters on l_discount).
# ---------------------------------------------------------------------------

_EXISTS_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@REGISTRY.register(
    "exists_discounted_orders",
    oracle=_EXISTS_ORACLE,
    description="correlated EXISTS (TPC-H Q4 shape) via left-semi join",
    tags=("join", "subquery"),
)
def exists_discounted_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.05)
    return (
        orders.join(
            li, orders.o_orderkey == li.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Scalar subquery per group (TPC-H Q17 shape): revenue from line items whose
# quantity is below half their part's average quantity.
# 100 TB: the per-part aggregate is |part|-sized; the join back to lineitem
# shuffles on l_partkey on both sides (co-partitioned), and AQE turns it
# into a broadcast when the aggregate side measures small. The avg is the
# exact decimal-sum/count form so the < threshold comparison is
# bit-identical in both engines (a double-noise avg could flip rows at the
# boundary).
# ---------------------------------------------------------------------------

_SCALAR_SUBQ_ORACLE = f"""
SELECT {decimal_sum_sql("CAST(l_extendedprice AS DECIMAL(18,2))")} / 7.0 AS avg_yearly
FROM lineitem l
JOIN (
  SELECT l_partkey, {exact_avg_sql('l_quantity')} AS avg_qty
  FROM lineitem GROUP BY l_partkey
) p ON l.l_partkey = p.l_partkey
WHERE l.l_quantity < 0.5 * p.avg_qty
"""


@REGISTRY.register(
    "scalar_subquery_part_avg",
    oracle=_SCALAR_SUBQ_ORACLE,
    description="per-group scalar subquery (TPC-H Q17 shape): qty below half of part avg",
    tags=("join", "subquery", "aggregate"),
)
def scalar_subquery_part_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part_avg = li.groupBy("l_partkey").agg(
        exact_avg("l_quantity").alias("avg_qty")
    )
    joined = li.select("l_partkey", "l_quantity", "l_extendedprice").join(
        part_avg, "l_partkey"
    )
    return joined.filter(
        F.col("l_quantity") < 0.5 * F.col("avg_qty")
    ).agg(
        (
            decimal_sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            / F.lit(7.0)
        ).alias("avg_yearly")
    )


# ---------------------------------------------------------------------------
# Disjunctive join predicate (TPC-H Q19 shape): OR of conjunctive clauses
# over both join sides.
# 100 TB: the equi-join on partkey stays a hash join; each disjunct's
# single-side conjuncts (brand/size on part, quantity on lineitem) are
# derivable as an OR-of-ranges filter Catalyst pushes below the join, so
# neither scan reads rows no disjunct can accept.
# ---------------------------------------------------------------------------

_OR_PREDICATE_ORACLE = f"""
SELECT {decimal_sum_sql(
    "(CAST(l_extendedprice AS DECIMAL(12,2)) * "
    "(CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4))))"
)} AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE
  (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
   AND l.l_quantity BETWEEN 1 AND 21)
  OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
   AND l.l_quantity BETWEEN 10 AND 30)
  OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
   AND l.l_quantity BETWEEN 20 AND 40)
"""


@REGISTRY.register(
    "or_predicate_revenue",
    oracle=_OR_PREDICATE_ORACLE,
    description="disjunctive multi-clause join predicate (TPC-H Q19 shape)",
    tags=("join", "predicate"),
)
def or_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#12") & s.between(1, 15) & q.between(1, 21))
        | ((b == "Brand#23") & s.between(1, 25) & q.between(10, 30))
        | ((b == "Brand#3") & s.between(1, 35) & q.between(20, 40))
    )
    from mapreduce_sm_spark.operators._parity import (
        disc_price_long,
        two_phase_sums,
    )

    joined = (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .select("l_extendedprice", "l_discount")
    )
    return two_phase_sums(
        joined, [], {"revenue": (disc_price_long(), 1000000)}
    )


# ---------------------------------------------------------------------------
# Multi-way join + top-N report (TPC-H Q10 shape, adapted: no returnflag on
# the fixture lineitem, so "problem orders" = o_orderstatus = 'F'): revenue
# lost per customer, top 20.
# 100 TB: lineitem->orders shuffle join on orderkey; customer and nation
# are dimension-sized (broadcast); final TakeOrderedAndProject, never a
# global sort.
# ---------------------------------------------------------------------------

_Q10_ORACLE = f"""
SELECT c_custkey, c_name, n_name,
       {decimal_sum_sql(
           "(CAST(l_extendedprice AS DECIMAL(12,2)) * "
           "(CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4))))"
       )} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


@REGISTRY.register(
    "q10_top_lost_revenue",
    oracle=_Q10_ORACLE,
    description="multi-way join + grouped top-N report (TPC-H Q10 shape)",
    tags=("join", "aggregate", "topk"),
)
def q10_top_lost_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    from mapreduce_sm_spark.operators._parity import (
        disc_price_long,
        two_phase_sums,
    )

    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = table(spark, sf_dir, "lineitem")
    n = table(spark, sf_dir, "nation")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", "c_name", "n_name", "l_extendedprice", "l_discount")
    )
    return (
        two_phase_sums(
            joined,
            ["c_custkey", "c_name", "n_name"],
            {"revenue": (disc_price_long(), 1000000)},
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# HAVING + IN-subquery (TPC-H Q18 shape): orders whose total quantity
# across line items exceeds a threshold, joined back for the report.
# Catalyst decorrelates the IN into a semi join against the HAVING
# aggregate — expressed directly below as aggregate + join.
# ---------------------------------------------------------------------------

_Q18_THRESHOLD = 120

_Q18_ORACLE = f"""
SELECT c_name, c_custkey, o_orderkey,
       round((CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR))::DOUBLE, 2) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > {_Q18_THRESHOLD}
)
GROUP BY c_name, c_custkey, o_orderkey
ORDER BY total_qty DESC, o_orderkey ASC
LIMIT 100
"""


@REGISTRY.register(
    "q18_large_quantity_orders",
    oracle=_Q18_ORACLE,
    description="HAVING + IN-subquery via semi join (TPC-H Q18 shape)",
    tags=("join", "subquery", "aggregate", "topk"),
)
def q18_large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .filter(F.col("q") > _Q18_THRESHOLD)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        li.join(big, li.l_orderkey == big.big_orderkey, "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"), 2
            ).alias("total_qty")
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Global-scalar-subquery threshold (TPC-H Q11 shape): customers whose
# revenue exceeds a fixed fraction of TOTAL revenue.
# 100 TB: the global total is a one-row aggregate broadcast into the
# filter — never a shuffle of the grouped side against itself.
# ---------------------------------------------------------------------------

_Q11_FRACTION = 0.0008

_Q11_ORACLE = f"""
WITH per_cust AS (
  SELECT o_custkey, (CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR))::DOUBLE AS rev
  FROM orders GROUP BY o_custkey
),
total AS (
  SELECT (CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR))::DOUBLE AS t FROM orders
)
SELECT o_custkey, rev
FROM per_cust, total
WHERE rev > t * {_Q11_FRACTION}
ORDER BY rev DESC, o_custkey ASC
"""


@REGISTRY.register(
    "q11_revenue_concentration",
    oracle=_Q11_ORACLE,
    description="global scalar-subquery threshold (TPC-H Q11 shape)",
    tags=("aggregate", "subquery"),
)
def q11_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    price_dec = F.col("o_totalprice").cast("decimal(18,2)")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(price_dec).cast("double").alias("rev")
    )
    total = o.agg(F.sum(price_dec).cast("double").alias("t"))
    return (
        per_cust.crossJoin(F.broadcast(total))
        .filter(F.col("rev") > F.col("t") * _Q11_FRACTION)
        .select("o_custkey", "rev")
        .orderBy(F.col("rev").desc(), F.col("o_custkey").asc())
    )


# ---------------------------------------------------------------------------
# Argmax join-back on an aggregated CTE (TPC-H Q15 shape): the top-revenue
# supplier(s) — aggregate once, take the max of the aggregate, join back
# on equality. Ties kept (same as the reference SQL's = max semantics).
# ---------------------------------------------------------------------------

_Q15_ORACLE = """
WITH rev AS (
  SELECT l_suppkey, (CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR))::DOUBLE AS total_rev
  FROM lineitem GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_rev
FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
ORDER BY s_suppkey
"""


@REGISTRY.register(
    "q15_top_supplier",
    oracle=_Q15_ORACLE,
    description="argmax join-back on aggregated CTE (TPC-H Q15 shape)",
    tags=("aggregate", "subquery", "join"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Correlated per-group-min subquery (TPC-H Q2 shape): the customer(s) with
# the minimum account balance of their nation. Decorrelated to a per-nation
# min aggregate + equality join — the exact rewrite Catalyst applies to
# the correlated form.
# ---------------------------------------------------------------------------

_Q2_ORACLE = """
SELECT c.c_custkey, c.c_name, c.c_nationkey::BIGINT AS nationkey, c.c_acctbal
FROM customer c
WHERE c.c_acctbal = (
  SELECT min(c2.c_acctbal) FROM customer c2
  WHERE c2.c_nationkey = c.c_nationkey
)
ORDER BY nationkey, c_custkey
"""


@REGISTRY.register(
    "q2_min_per_group",
    oracle=_Q2_ORACLE,
    description="correlated per-group-min subquery (TPC-H Q2 shape), decorrelated",
    tags=("aggregate", "subquery", "join"),
)
def q2_min_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    mins = (
        c.groupBy("c_nationkey")
        .agg(F.min("c_acctbal").alias("min_bal"))
        .select(F.col("c_nationkey").alias("nk"), "min_bal")
    )
    return (
        c.join(
            F.broadcast(mins),
            (F.col("c_nationkey") == F.col("nk"))
            & (F.col("c_acctbal") == F.col("min_bal")),
        )
        .select(
            "c_custkey",
            "c_name",
            F.col("c_nationkey").cast("long").alias("nationkey"),
            "c_acctbal",
        )
        .orderBy("nationkey", "c_custkey")
    )


# ---------------------------------------------------------------------------
# LATERAL correlated subquery with ORDER BY + LIMIT — the per-row top-k
# SQL shape (Spark 4 decorrelates it into a ranked join; the plan never
# executes the inner query once per outer row). Top-2 orders by price per
# active customer. Both engines run the IDENTICAL SQL text.
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
FROM (SELECT DISTINCT o_custkey AS c_custkey FROM orders) c,
LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) l
ORDER BY c.c_custkey, l.o_totalprice DESC, l.o_orderkey
"""


@REGISTRY.register(
    "lateral_top2_orders",
    oracle=_LATERAL_SQL,
    description="LATERAL correlated top-2 subquery per customer (decorrelated by Catalyst)",
    tags=("sql", "subquery", "lateral", "topk"),
)
def lateral_top2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_LATERAL_SQL)


# ---------------------------------------------------------------------------
# Recursive CTE (Spark 4 WITH RECURSIVE, UNION ALL form): build a month
# spine from the first to the last order month by recursion, then
# left-join per-month order counts so gap months appear with 0 — the
# recursive twin of calendar_spine_orders' sequence() generator. The
# recursion is acyclic and bounded by the date span (Spark's recursive
# CTE currently supports UNION ALL only, so cyclic closures like
# connected components stay on the iterative DataFrame path).
#
# Perf note: Spark schedules one job per recursion step, so an N-month
# span costs N sequential tiny jobs — fine for a bounded spine, wrong
# for long chains. The production calendar path is the sequence()
# generator (calendar_spine_orders); this query exists to cover the
# WITH RECURSIVE surface with an oracle.
# ---------------------------------------------------------------------------

_RECURSIVE_SQL = """
WITH RECURSIVE months(m) AS (
  SELECT date_trunc('month', min(o_orderdate)) FROM orders
  UNION ALL
  SELECT m + INTERVAL 1 MONTH FROM months
  WHERE m < (SELECT date_trunc('month', max(o_orderdate)) FROM orders)
),
per_month AS (
  SELECT date_trunc('month', o_orderdate) AS m, count(*) AS n
  FROM orders GROUP BY 1
)
SELECT CAST(months.m AS DATE) AS month, coalesce(per_month.n, 0) AS n_orders
FROM months LEFT JOIN per_month ON months.m = per_month.m
ORDER BY month
"""


@REGISTRY.register(
    "recursive_month_spine",
    oracle=_RECURSIVE_SQL,
    description="WITH RECURSIVE month spine + gap-filled order counts",
    tags=("sql", "recursive", "calendar"),
)
def recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_RECURSIVE_SQL)
