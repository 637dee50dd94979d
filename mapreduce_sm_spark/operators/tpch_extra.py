"""Remaining TPC-H query shapes (Q4/Q6/Q7/Q8/Q9/Q12/Q13/Q16/Q17/Q20/Q21/Q22),
adapted to the fixture star schema (FIXTURES.md §2 — no partsupp table, no
commit/receipt dates, phone, or shipmode columns; lateness is expressed as
l_shipdate vs o_orderdate, supply cost as a retail-price fraction, and
country codes as nation-key digits).

The reference has no joins or subqueries of any kind (SURVEY §2.B,
/root/reference/src/mapreduce.c — a single input file exists at
include/mapreduce.h:111), so this whole family is engine-new capability.
Together with relational.py/olap.py this completes all 22 TPC-H shapes.

Every query is a declarative DataFrame plan: Catalyst decorrelates the
EXISTS/NOT EXISTS patterns into semi/anti hash joins, pushes filters into
the parquet scans, and AQE resizes the shuffles. Scale notes per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_sm_spark.operators._parity import (
    DISC_PRICE_SQL,
    decimal_sum,
    decimal_sum_sql,
    disc_price,
    disc_price_long,
    exact_avg_sql,
    money_cents,
    money_sum,
    money_sum_sql,
    two_phase_sums,
)
from mapreduce_sm_spark.registry import REGISTRY
from mapreduce_sm_spark.session import table


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# ---------------------------------------------------------------------------
# q4 — order priority checking: date-range scan + correlated EXISTS.
# 100 TB: the EXISTS decorrelates to a LEFT SEMI hash join on l_orderkey;
# only (l_orderkey, l_shipdate) is read from lineitem (column pruning), and
# the orders date filter prunes before the shuffle.
# ---------------------------------------------------------------------------

_Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate <  TIMESTAMP '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@REGISTRY.register(
    "q4_order_priority",
    oracle=_Q4_ORACLE,
    description="TPC-H Q4-shape: EXISTS decorrelated to a semi join",
    tags=("join", "subquery", "aggregate"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= _ts("1996-07-01"))
            & (F.col("o_orderdate") < _ts("1996-10-01"))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    semi = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        semi.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q6 — forecasting revenue change: pure scan + filter + global sum.
# 100 TB: no join, no wide shuffle — partial sums per input partition then
# one exchange of a handful of rows. All three predicates push to parquet.
# ---------------------------------------------------------------------------

_Q6_ORACLE = f"""
SELECT {decimal_sum_sql(
    "(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(6,4)))"
)} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@REGISTRY.register(
    "q6_forecast_revenue",
    oracle=_Q6_ORACLE,
    description="TPC-H Q6-shape: selective scan + exact global money sum",
    tags=("aggregate", "scan"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    flt = li.filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    # l_extendedprice * l_discount as an exact 1e6-scaled int64 (<= ~1e11/row)
    rev = money_cents("l_extendedprice") * F.round(
        F.col("l_discount") * 10000
    ).cast("long")
    return two_phase_sums(flt, [], {"revenue": (rev, 1000000)})


# ---------------------------------------------------------------------------
# q7 — volume shipping between two nations: 6-way join, symmetric nation
# pair predicate, group by (supp_nation, cust_nation, year).
# 100 TB: nation/supplier broadcast; lineitem⋈orders and ⋈customer are the
# two shuffles. The date filter halves the lineitem scan first.
# ---------------------------------------------------------------------------

_Q7_ORACLE = f"""
SELECT
  n1.n_name AS supp_nation,
  n2.n_name AS cust_nation,
  year(l_shipdate) AS l_year,
  {decimal_sum_sql(DISC_PRICE_SQL)} AS revenue
FROM supplier
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@REGISTRY.register(
    "q7_volume_shipping",
    oracle=_Q7_ORACLE,
    description="TPC-H Q7-shape: two-nation volume with symmetric pair filter",
    tags=("join", "aggregate"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            "l_extendedprice",
            "l_discount",
            F.year("l_shipdate").alias("l_year"),
        )
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        two_phase_sums(
            joined,
            ["supp_nation", "cust_nation", "l_year"],
            {"revenue": (disc_price_long(), 1000000)},
        )
        .select("supp_nation", "cust_nation", "l_year", "revenue")
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# q8 — national market share inside a region, by order year.
# 100 TB: part filter prunes lineitem via the broadcast join before the big
# orders shuffle; the share is a conditional-sum / sum ratio computed in one
# aggregate pass (no self-join).
# ---------------------------------------------------------------------------

_Q8_ORACLE = f"""
SELECT
  o_year,
  (CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume
             ELSE CAST(0 AS DECIMAL(20,6)) END) AS VARCHAR))::DOUBLE
  / (CAST(sum(volume) AS VARCHAR))::DOUBLE AS mkt_share
FROM (
  SELECT
    year(o_orderdate) AS o_year,
    {DISC_PRICE_SQL} AS volume,
    n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


@REGISTRY.register(
    "q8_market_share",
    oracle=_Q8_ORACLE,
    description="TPC-H Q8-shape: conditional-sum ratio market share",
    tags=("join", "aggregate"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    # customer-side nations restricted to the region (semi via inner join)
    n1 = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("n1_key"))
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
    )
    vol = disc_price()  # decimal(20,6) in Spark's promotion rules
    num = F.sum(
        F.when(F.col("nation") == "NATION_3", vol).otherwise(
            F.lit(0).cast("decimal(20,6)")
        )
    ).cast("double")
    den = F.sum(vol).cast("double")
    return (
        joined.groupBy("o_year")
        .agg((num / den).alias("mkt_share"))
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# q9 — product-type profit by nation and year. No partsupp in the fixtures:
# supply cost is modeled as 10% of p_retailprice per unit (decimal-exact in
# both engines).
# 100 TB: part LIKE-filter broadcasts; profit arithmetic stays in decimal
# inside codegen; single shuffle to (nation, year).
# ---------------------------------------------------------------------------

_Q9_ORACLE = f"""
SELECT
  n_name AS nation,
  year(o_orderdate) AS o_year,
  {decimal_sum_sql(
      f"({DISC_PRICE_SQL} - (CAST(p_retailprice AS DECIMAL(12,2))"
      " * CAST(l_quantity AS DECIMAL(12,2)) * CAST(0.1 AS DECIMAL(2,1))))"
  )} AS sum_profit
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, o_year
ORDER BY nation, o_year DESC
"""


@REGISTRY.register(
    "q9_product_profit",
    oracle=_Q9_ORACLE,
    description="TPC-H Q9-shape: profit by nation/year, decimal-exact cost model",
    headline=True,
    tags=("join", "aggregate"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    )
    cost = (
        F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(12,2)")
        * F.lit("0.1").cast("decimal(2,1)")
    )
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    )
    return (
        joined.groupBy("nation", "o_year")
        .agg(decimal_sum(disc_price() - cost).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# q12 — shipping "mode" (l_linestatus stands in — no shipmode column) vs
# order priority, counting only lineitems shipped >= 60 days after order.
# 100 TB: one shuffle join on orderkey; the CASE counts are map-side
# partial-aggregated (pure int64).
# ---------------------------------------------------------------------------

_Q12_ORACLE = """
SELECT
  l_linestatus,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)
    AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)
    AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


@REGISTRY.register(
    "q12_late_shipment_priority",
    oracle=_Q12_ORACLE,
    description="TPC-H Q12-shape: late-shipment priority class counts",
    tags=("join", "aggregate"),
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .select("l_orderkey", "l_shipdate", "l_linestatus")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# ---------------------------------------------------------------------------
# q13 — customer order-count distribution: LEFT OUTER join keeps order-less
# customers (c_count = 0), then a distribution over the counts.
# 100 TB: two shuffles (custkey, then tiny c_count); the priority filter is
# applied to orders BEFORE the outer join — equivalent to the classic
# in-join predicate and prunes the shuffle.
# ---------------------------------------------------------------------------

_Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@REGISTRY.register(
    "q13_customer_distribution",
    oracle=_Q13_ORACLE,
    description="TPC-H Q13-shape: outer-join order-count distribution",
    tags=("join", "aggregate", "outer"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# q16 — part/supplier variety: distinct suppliers per (brand, type, size),
# using lineitem's (partkey, suppkey) pairs in place of partsupp.
# 100 TB: countDistinct plans as a two-level aggregate (dedup shuffle on
# the full grouping key + suppkey, then final count) — no row explosion.
# ---------------------------------------------------------------------------

_Q16_ORACLE = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM part
JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5' AND p_size IN (1, 4, 9, 14, 23, 36, 45, 50)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@REGISTRY.register(
    "q16_part_supplier_variety",
    oracle=_Q16_ORACLE,
    description="TPC-H Q16-shape: distinct-supplier counts per part class",
    tags=("join", "aggregate", "distinct"),
)
def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#5")
            & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 50)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


# ---------------------------------------------------------------------------
# q17 — small-quantity-order revenue: correlated average subquery.
# 100 TB: the per-part average is computed ONCE on the brand-filtered
# lineitem subset (semi-pruned via the broadcast part list), then joined
# back — Catalyst's decorrelation shape, written explicitly. The
# l_quantity < 0.2*avg(l_quantity) cut is evaluated as the exact integer
# inequality 5*qty_cents*n < sum(qty_cents) (multiply through by 100n/20),
# so the boundary cannot drift even if a future fixture makes quantities
# fractional (the old form was exact only for integer-valued quantities).
# ---------------------------------------------------------------------------

_Q17_ORACLE = f"""
WITH t AS (
  SELECT l_partkey AS t_partkey, count(*) AS n,
         sum(CAST(round(l_quantity * 100) AS BIGINT)) AS sqc
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#23'
  GROUP BY l_partkey
)
SELECT {money_sum_sql('l_extendedprice')} / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN t ON t_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND 5 * CAST(round(l_quantity * 100) AS BIGINT) * n < sqc
"""


@REGISTRY.register(
    "q17_small_quantity_revenue",
    oracle=_Q17_ORACLE,
    description="TPC-H Q17-shape: correlated avg subquery via self-join",
    tags=("join", "subquery", "aggregate"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    lif = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    lifc = lif.withColumn(
        "qc", F.round(F.col("l_quantity") * 100, 0).cast("long")
    )
    thresh = lifc.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.count("*").alias("n"), F.sum("qc").alias("sqc")
    )
    return (
        lifc.join(thresh, lifc.l_partkey == F.col("t_partkey"))
        .filter(F.lit(5) * F.col("qc") * F.col("n") < F.col("sqc"))
        .agg((money_sum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# q20 — suppliers with large shipped volume of a part family ("potential
# promotion"): IN-subquery with HAVING, decorrelated to agg + semi join.
# 100 TB: lineitem is pruned by the broadcast part list and date filter
# before the per-supplier aggregate; supplier (small dim) joins semi
# against the qualifying-supplier set.
# ---------------------------------------------------------------------------

_Q20_ORACLE = """
SELECT s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'small%'
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey
  HAVING sum(l_quantity) > 400
)
ORDER BY s_name
"""


@REGISTRY.register(
    "q20_volume_suppliers",
    oracle=_Q20_ORACLE,
    description="TPC-H Q20-shape: HAVING-gated IN subquery as agg + semi join",
    tags=("join", "subquery", "aggregate"),
)
def q20_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
    )
    # exact integer-cent sums: qty is integer-valued, > 400 <=> > 40000 cents
    qualifying = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(money_cents("l_quantity")).alias("qty_c"))
        .filter(F.col("qty_c") > 400 * 100)
        .select("l_suppkey")
    )
    supp = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal"
    )
    return (
        supp.join(
            qualifying, supp.s_suppkey == qualifying.l_suppkey, "left_semi"
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# q21 — suppliers who kept orders waiting: the classic EXISTS + NOT EXISTS
# double-correlation. "Late" = shipped > 90 days after the order date
# (no receipt/commit dates in the fixture).
# 100 TB: both correlations are orderkey-equi semi/anti hash joins over the
# same late-lineitem build side; the non-equi suppkey<>suppkey term rides
# along as a join residual. supplier/nation broadcast.
# ---------------------------------------------------------------------------

_Q21_ORACLE = """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


@REGISTRY.register(
    "q21_waiting_suppliers",
    oracle=_Q21_ORACLE,
    description="TPC-H Q21-shape: EXISTS + NOT EXISTS semi/anti joins",
    tags=("join", "subquery", "aggregate"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late_cut = F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    l1 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > late_cut)
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    others = li.select(
        F.col("l_orderkey").alias("k2"),
        F.col("l_suppkey").alias("s2"),
        F.col("l_shipdate").alias("d2"),
    )
    with_other = l1.join(
        others,
        (l1.l_orderkey == F.col("k2")) & (F.col("s2") != l1.l_suppkey),
        "left_semi",
    )
    sole_late = with_other.join(
        others,
        (with_other.l_orderkey == F.col("k2"))
        & (F.col("s2") != with_other.l_suppkey)
        & (F.col("d2") > with_other.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        "left_anti",
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_late.join(F.broadcast(supp), sole_late.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


# ---------------------------------------------------------------------------
# q22 — dormant wealthy customers: country code = nation-key digit (no phone
# column); "dormant" = no urgent orders (every fixture customer has orders).
# The scalar average is joined in as a broadcast 1-row aggregate — no
# driver-side collect.
# 100 TB: customer scans twice (once for the global avg, once filtered) —
# both scans prune to 2 columns; the anti join shuffles on custkey.
# ---------------------------------------------------------------------------

_Q22_ORACLE = f"""
SELECT (c_nationkey % 10) AS cntrycode,
       count(*) AS numcust,
       {money_sum_sql('c_acctbal')} AS totacctbal
FROM customer
WHERE c_nationkey % 10 IN (1, 3, 5, 7, 9)
  AND c_acctbal > (
    SELECT {exact_avg_sql('c_acctbal')}
    FROM customer
    WHERE c_acctbal > 0.0 AND c_nationkey % 10 IN (1, 3, 5, 7, 9)
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
  )
GROUP BY cntrycode
ORDER BY cntrycode
"""


@REGISTRY.register(
    "q22_dormant_customers",
    oracle=_Q22_ORACLE,
    description="TPC-H Q22-shape: scalar-avg subquery + NOT EXISTS anti join",
    tags=("join", "subquery", "aggregate"),
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        table(spark, sf_dir, "customer")
        .withColumn("cntrycode", F.col("c_nationkey") % 10)
        .filter(F.col("cntrycode").isin(1, 3, 5, 7, 9))
        .select("c_custkey", "cntrycode", "c_acctbal")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double")
            / F.count("c_acctbal").cast("double")
        ).alias("avg_bal")
    )
    urgent = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    wealthy = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    dormant = wealthy.join(
        urgent, wealthy.c_custkey == urgent.o_custkey, "left_anti"
    )
    return (
        dormant.groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            money_sum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
