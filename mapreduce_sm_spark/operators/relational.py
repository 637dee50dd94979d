"""Relational operators the reference entirely lacks (SURVEY §2.B):
joins of every flavor, standard/grouped/distinct aggregation, grouping
sets (rollup/cube), set operations, top-k, scalar function surface.

All plans are declarative DataFrame expressions — Catalyst supplies
predicate pushdown, column pruning, join selection, and AQE supplies
runtime skew handling. Scale annotations are per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_sm_spark.operators._parity import (
    CHARGE_SQL,
    DISC_PRICE_SQL,
    charge,
    date_str,
    date_str_sql,
    decimal_sum,
    decimal_sum_sql,
    disc_price,
    disc_price_long,
    exact_avg,
    exact_avg_sql,
    money_sum,
    money_sum_sql,
    two_phase_sums,
)
from mapreduce_sm_spark.registry import REGISTRY
from mapreduce_sm_spark.session import table


# ---------------------------------------------------------------------------
# q1 — pricing summary (TPC-H Q1 shape): scan-heavy filter + wide aggregate.
# 100 TB: single shuffle on a 6-value grouping key; partial aggregation
# reduces the exchange to a handful of rows per input partition.
# ---------------------------------------------------------------------------

_Q1_ORACLE = f"""
SELECT
  l_returnflag, l_linestatus,
  {money_sum_sql('l_quantity')} AS sum_qty,
  {money_sum_sql('l_extendedprice')} AS sum_base_price,
  {decimal_sum_sql(DISC_PRICE_SQL)} AS sum_disc_price,
  {decimal_sum_sql(CHARGE_SQL)} AS sum_charge,
  {exact_avg_sql('l_quantity')} AS avg_qty,
  {exact_avg_sql('l_extendedprice')} AS avg_price,
  {exact_avg_sql('l_discount')} AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@REGISTRY.register(
    "q1_pricing_summary",
    oracle=_Q1_ORACLE,
    description="TPC-H Q1-shape scan+filter+grouped aggregate",
    headline=True,
    tags=("aggregate",),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase scaled-int64 aggregation (exact, order-independent,
    overflow-safe):

    Stage 1 sums SCALED INTEGER money per (group, input partition) — pure
    int64 arithmetic inside whole-stage codegen, no per-row BigDecimal
    (~4x cheaper than a decimal accumulator). A partition holds <= ~4M
    rows (128 MB splits), so per-partition subtotals stay orders of
    magnitude below int64 range: qty/price are 1e2-scaled (<=1e13/row is
    impossible; actual <=1e7), disc_price is 1e6-scaled (<=1e11/row ->
    <=4e17/partition), and the 1e10-scaled charge term is split into
    div/mod 1e6 halves so each half's subtotal is <=4e15. Stage 2 merges
    the per-partition partials in decimal (exact for any partition count)
    and converts to double once — bit-identical to a direct decimal sum,
    which is what the unchanged oracle computes.
    """
    li = table(spark, sf_dir, "lineitem")
    flt = li.filter(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp")
    )
    qty_c = F.round(F.col("l_quantity") * 100).cast("long")  # 1e2
    ep_c = F.round(F.col("l_extendedprice") * 100).cast("long")  # 1e2
    d4 = F.round(F.col("l_discount") * 10000).cast("long")  # 1e4
    t4 = F.round(F.col("l_tax") * 10000).cast("long")  # 1e4
    lp = ep_c * (F.lit(10000) - d4)  # disc_price, 1e6-scaled, <=1e11/row
    ch = lp * (F.lit(10000) + t4)  # charge, 1e10-scaled, <=1e15/row
    # exact high/low split of ch: (ch - ch%1e6) is an exact multiple of 1e6
    # <= 1e15 < 2^53, so the double division below is EXACT (both operands
    # and the integer quotient are representable)
    ch_lo = ch % 1000000
    ch_hi = ((ch - ch_lo) / F.lit(1000000)).cast("long")  # <=1e9/row
    partials = flt.groupBy(
        "l_returnflag", "l_linestatus", F.spark_partition_id().alias("_p")
    ).agg(
        F.sum(qty_c).alias("s_qty"),
        F.sum(ep_c).alias("s_ep"),
        F.sum(d4).alias("s_disc"),
        F.sum(lp).alias("s_lp"),
        F.sum(ch_hi).alias("s_ch_hi"),
        F.sum(ch_lo).alias("s_ch_lo"),
        F.count("*").alias("n"),
    )

    def dec(col: str):
        return F.sum(F.col(col).cast("decimal(38,0)"))

    n = F.sum("n")
    return (
        partials.groupBy("l_returnflag", "l_linestatus")
        .agg(
            (dec("s_qty") / 100).cast("double").alias("sum_qty"),
            (dec("s_ep") / 100).cast("double").alias("sum_base_price"),
            (dec("s_lp") / 1000000).cast("double").alias("sum_disc_price"),
            ((dec("s_ch_hi") * 1000000 + dec("s_ch_lo")) / F.lit(10000000000))
            .cast("double")
            .alias("sum_charge"),
            ((dec("s_qty") / 100).cast("double") / n.cast("double")).alias(
                "avg_qty"
            ),
            ((dec("s_ep") / 100).cast("double") / n.cast("double")).alias(
                "avg_price"
            ),
            ((dec("s_disc") / 10000).cast("double") / n.cast("double")).alias(
                "avg_disc"
            ),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# q3 — shipping priority: 3-way join + aggregate + top-k.
# 100 TB: customer filter prunes before the join; orders⋈lineitem is the
# big shuffle join (AQE-skew-safe); top-10 is TakeOrderedAndProject —
# no global sort materialization.
# ---------------------------------------------------------------------------

_Q3_ORACLE = f"""
SELECT
  l_orderkey,
  {decimal_sum_sql(DISC_PRICE_SQL)} AS revenue,
  {date_str_sql('o_orderdate')} AS orderdate,
  o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


@REGISTRY.register(
    "q3_shipping_priority",
    oracle=_Q3_ORACLE,
    description="TPC-H Q3-shape 3-way join + agg + top-k",
    headline=True,
    tags=("join", "aggregate", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15").cast("timestamp")
    cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "l_orderkey",
            date_str("o_orderdate").alias("orderdate"),
            "o_orderpriority",
            "l_extendedprice",
            "l_discount",
        )
    )
    return (
        two_phase_sums(
            joined,
            ["l_orderkey", "orderdate", "o_orderpriority"],
            {"revenue": (disc_price_long(), 1000000)},
        )
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q5 — local supplier volume: 6-way star join.
# 100 TB: region/nation/customer/supplier are dimensions -> broadcast;
# only orders⋈lineitem shuffles. Join order written smallest-first but
# Catalyst/AQE may reorder freely.
# ---------------------------------------------------------------------------

_Q5_ORACLE = f"""
SELECT
  n_name,
  {decimal_sum_sql(DISC_PRICE_SQL)} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


@REGISTRY.register(
    "q5_local_supplier_volume",
    oracle=_Q5_ORACLE,
    description="TPC-H Q5-shape 6-way star join with broadcast dimensions",
    headline=True,
    tags=("join", "aggregate"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = (
        table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    dim_nation = F.broadcast(
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("n_nationkey", "n_name")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(dim_nation, supp.s_nationkey == F.col("n_nationkey"))
        .select("n_name", "l_extendedprice", "l_discount")
    )
    return two_phase_sums(
        joined, ["n_name"], {"revenue": (disc_price_long(), 1000000)}
    ).orderBy(F.col("revenue").desc(), F.col("n_name").asc())


# ---------------------------------------------------------------------------
# joins: semi / anti — the EXISTS / NOT EXISTS shapes.
# 100 TB: left-semi/anti shuffle only the join keys of the probe side.
# ---------------------------------------------------------------------------

_SEMI_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
ORDER BY c_custkey
"""


@REGISTRY.register(
    "join_semi_big_spenders",
    oracle=_SEMI_ORACLE,
    description="left-semi join (EXISTS): customers with a >300k order",
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select("o_custkey")
    )
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .orderBy("c_custkey")
    )


_ANTI_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


@REGISTRY.register(
    "join_anti_no_orders",
    oracle=_ANTI_ORACLE,
    description="left-anti join (NOT EXISTS): customers with no orders",
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = table(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# outer join + null handling
# ---------------------------------------------------------------------------

_OUTER_ORACLE = f"""
SELECT c_custkey, count(o_orderkey) AS n_orders,
       coalesce({money_sum_sql('o_totalprice')}, 0.0) AS total_spent
FROM customer
LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey
ORDER BY c_custkey
"""


@REGISTRY.register(
    "join_outer_order_counts",
    oracle=_OUTER_ORACLE,
    description="left-outer join + per-customer order count/total (null-safe)",
    tags=("join", "aggregate"),
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(money_sum("o_totalprice"), F.lit(0.0)).alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# distinct aggregation
# ---------------------------------------------------------------------------

_DISTINCT_ORACLE = """
SELECT c_mktsegment,
       count(*) AS n_customers,
       count(DISTINCT c_nationkey) AS n_nations
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@REGISTRY.register(
    "agg_distinct_segments",
    oracle=_DISTINCT_ORACLE,
    description="count + count(distinct) per group (expand-based distinct agg)",
    tags=("aggregate",),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.countDistinct("c_nationkey").alias("n_nations"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# grouping sets: rollup & cube (the reference has no grouping at all beyond
# a single key — SURVEY §2.B). grouping() flags disambiguate NULL-as-total.
# ---------------------------------------------------------------------------

_ROLLUP_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       grouping(l_returnflag)::INT AS g_rf, grouping(l_linestatus)::INT AS g_ls,
       {money_sum_sql('l_quantity')} AS sum_qty, count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


@REGISTRY.register(
    "rollup_lineitem",
    oracle=_ROLLUP_ORACLE,
    description="ROLLUP grouping-set aggregate with grouping() flags",
    tags=("aggregate", "grouping-sets"),
)
def rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.grouping("l_linestatus").cast("int").alias("g_ls"),
            money_sum("l_quantity").alias("sum_qty"),
            F.count("*").alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "g_rf", "g_ls", "sum_qty", "n")
        .orderBy(
            "g_rf",
            "g_ls",
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


_CUBE_ORACLE = f"""
SELECT o_orderstatus, o_orderpriority,
       grouping(o_orderstatus)::INT AS g_st, grouping(o_orderpriority)::INT AS g_pr,
       count(*) AS n, {money_sum_sql('o_totalprice')} AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY g_st, g_pr, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


@REGISTRY.register(
    "cube_orders",
    oracle=_CUBE_ORACLE,
    description="CUBE grouping-set aggregate over orders",
    tags=("aggregate", "grouping-sets"),
)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_st"),
            F.grouping("o_orderpriority").cast("int").alias("g_pr"),
            F.count("*").alias("n"),
            money_sum("o_totalprice").alias("total"),
        )
        .select("o_orderstatus", "o_orderpriority", "g_st", "g_pr", "n", "total")
        .orderBy(
            "g_st",
            "g_pr",
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


# ---------------------------------------------------------------------------
# set operations
# ---------------------------------------------------------------------------

_SETOP_ORACLE = """
WITH cn AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
     sn AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
SELECT 'union' AS op, nk FROM (SELECT nk FROM cn UNION SELECT nk FROM sn)
UNION ALL
SELECT 'intersect' AS op, nk FROM (SELECT nk FROM cn INTERSECT SELECT nk FROM sn)
UNION ALL
SELECT 'except' AS op, nk FROM (SELECT nk FROM cn EXCEPT SELECT nk FROM sn)
ORDER BY op, nk
"""


@REGISTRY.register(
    "setops_nations",
    oracle=_SETOP_ORACLE,
    description="UNION / INTERSECT / EXCEPT over customer vs supplier nations",
    tags=("setop",),
)
def setops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = (
        table(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("nk"))
        .distinct()
    )
    sn = (
        table(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").alias("nk"))
        .distinct()
    )
    tag = lambda df, op: df.select(F.lit(op).alias("op"), "nk")  # noqa: E731
    return (
        tag(cn.union(sn).distinct(), "union")
        .unionAll(tag(cn.intersect(sn), "intersect"))
        .unionAll(tag(cn.exceptAll(sn).distinct(), "except"))
        .orderBy("op", "nk")
    )


# ---------------------------------------------------------------------------
# top-k: TakeOrderedAndProject — never a full global sort.
# ---------------------------------------------------------------------------

_TOPK_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


@REGISTRY.register(
    "topk_orders",
    oracle=_TOPK_ORACLE,
    description="top-100 orders by price (TakeOrderedAndProject, no global sort)",
    tags=("topk", "sort"),
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


# ---------------------------------------------------------------------------
# scalar function surface: string/date/math per-row (no FP aggregation, so
# parity is trivially exact). LIMIT keeps the check set small.
# ---------------------------------------------------------------------------

_SCALAR_ORACLE = """
SELECT
  o_orderkey,
  upper(substr(o_orderpriority, 1, 8)) AS prio_u,
  length(o_orderpriority) AS prio_len,
  concat(o_orderstatus, '-', CAST(o_custkey AS VARCHAR)) AS status_cust,
  year(o_orderdate) AS oyear,
  month(o_orderdate) AS omonth,
  datediff('day', DATE '1995-01-01', o_orderdate::DATE) AS days_since,
  (CAST(round(o_totalprice * 100) AS BIGINT) / 100000.0) AS price_k,
  CAST(floor(sqrt(o_totalprice)) AS BIGINT) AS sqrt_floor,
  abs(o_custkey - 100) AS custdist
FROM orders
ORDER BY o_orderkey
LIMIT 500
"""


@REGISTRY.register(
    "scalar_functions",
    oracle=_SCALAR_ORACLE,
    description="string/date/math scalar function surface, row-level",
    tags=("scalar",),
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.upper(F.substring("o_orderpriority", 1, 8)).alias("prio_u"),
            F.length("o_orderpriority").alias("prio_len"),
            F.concat_ws(
                "-", F.col("o_orderstatus"), F.col("o_custkey").cast("string")
            ).alias("status_cust"),
            F.year("o_orderdate").alias("oyear"),
            F.month("o_orderdate").alias("omonth"),
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
            ).cast("long").alias("days_since"),
            # price in k$ via exact integer cents / 1e5: a plain
            # round(price/1000, 3) ties exactly on every .50-cent row,
            # where engine round conventions can split (the r04 hash-red
            # class); cents/1e5 is the identical IEEE division on both
            # engines — no round, no tie
            (
                F.round(F.col("o_totalprice") * 100, 0).cast("long")
                / F.lit(100000.0)
            ).alias("price_k"),
            F.floor(F.sqrt("o_totalprice")).cast("long").alias("sqrt_floor"),
            F.abs(F.col("o_custkey") - 100).alias("custdist"),
        )
        .orderBy("o_orderkey")
        .limit(500)
    )


# ---------------------------------------------------------------------------
# Exact interpolated percentiles — engine-portable by construction.
#
# The previous shape emitted Spark `percentile` / DuckDB `quantile_cont`
# raw doubles and relied on the two engines' interpolation formulas being
# bit-identical ("verified empirically") — exactly the engine-version
# drift class behind the r03/r04 red rows (PLANS.md r05 post-mortem).
# Now the quantiles are computed from the same construction in BOTH
# engines, entirely in integers: prices become cents (2-decimal grid, so
# round(x*100) agrees everywhere), the lo/hi order statistics at 0-based
# position (n-1)*q come from a row_number window, and the linear
# interpolation lo + (hi-lo)*frac with frac in {0,.25,.5,.75} is emitted
# in QUARTER-CENTS: 4*lo_cents + (hi_cents-lo_cents)*(r/25) where
# r = ((n-1)*25q) mod 100 — an exact integer, no double anywhere.
#
# 100 TB shape: one window sort per group key (the same sort an exact
# quantile needs) + one hash aggregation over the same partitioning.
# ---------------------------------------------------------------------------

_PCT_ORACLE = """
WITH cents AS (
  SELECT o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
),
ranked AS (
  SELECT o_orderpriority, c,
         row_number() OVER (PARTITION BY o_orderpriority ORDER BY c) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM cents
),
picks AS (
  SELECT o_orderpriority, n,
         min(CASE WHEN rn = ((n-1)*25) // 100 + 1 THEN c END) AS lo25,
         min(CASE WHEN rn = least(((n-1)*25) // 100 + 2, n) THEN c END) AS hi25,
         min(CASE WHEN rn = ((n-1)*50) // 100 + 1 THEN c END) AS lo50,
         min(CASE WHEN rn = least(((n-1)*50) // 100 + 2, n) THEN c END) AS hi50,
         min(CASE WHEN rn = ((n-1)*75) // 100 + 1 THEN c END) AS lo75,
         min(CASE WHEN rn = least(((n-1)*75) // 100 + 2, n) THEN c END) AS hi75
  FROM ranked
  GROUP BY o_orderpriority, n
)
SELECT o_orderpriority,
       4*lo25 + (hi25 - lo25) * ((((n-1)*25) % 100) // 25) AS p25_qc,
       4*lo50 + (hi50 - lo50) * ((((n-1)*50) % 100) // 25) AS p50_qc,
       4*lo75 + (hi75 - lo75) * ((((n-1)*75) % 100) // 25) AS p75_qc,
       n
FROM picks
ORDER BY o_orderpriority
"""


@REGISTRY.register(
    "percentiles_order_price",
    oracle=_PCT_ORACLE,
    description="exact interpolated p25/p50/p75 per order priority, quarter-cent integers",
    tags=("aggregate", "percentile"),
)
def percentiles_order_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c"),
    )
    wrank = Window.partitionBy("o_orderpriority").orderBy("c")
    wall = Window.partitionBy("o_orderpriority")
    ranked = o.withColumn("rn", F.row_number().over(wrank)).withColumn(
        "n", F.count("*").over(wall)
    )

    def pick(q: int):
        lo_rn = F.expr(f"((n-1)*{q}) div 100 + 1")
        hi_rn = F.least(F.expr(f"((n-1)*{q}) div 100 + 2"), F.col("n"))
        lo = F.min(F.when(F.col("rn") == lo_rn, F.col("c")))
        hi = F.min(F.when(F.col("rn") == hi_rn, F.col("c")))
        return lo.alias(f"lo{q}"), hi.alias(f"hi{q}")

    picks = ranked.groupBy("o_orderpriority", "n").agg(
        *pick(25), *pick(50), *pick(75)
    )

    def qc(q: int):
        r4 = F.expr(f"(((n-1)*{q}) % 100) div 25")
        return (
            4 * F.col(f"lo{q}") + (F.col(f"hi{q}") - F.col(f"lo{q}")) * r4
        ).alias(f"p{q}_qc")

    return picks.select(
        "o_orderpriority", qc(25), qc(50), qc(75), "n"
    ).orderBy("o_orderpriority")


# ---------------------------------------------------------------------------
# Approximate percentiles (GK sketch): the 100 TB path when exact
# percentile's full sort is too expensive. Two engines' sketches never
# agree value-for-value, so the DRIVER-CHECKED output is the sketch's
# *verified error contract*: for each quantile q the Spark side computes
# the exact rank of the sketch's answer with a second pass and emits
# whether |rank - q*n| is within the GK guarantee (n/accuracy, +1 for
# ties); the oracle asserts the guarantee holds (all-true). A sketch
# regression (or a broken accuracy knob) flips a boolean and the hash
# catches it. The raw sketch values stay pytest-bounded in
# tests/test_scale.py.
# ---------------------------------------------------------------------------

_APPROX_ACC = 10000

_APPROX_PCT_ORACLE = """
SELECT l_returnflag, count(*) AS n,
       true AS p50_ok, true AS p90_ok, true AS p99_ok
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@REGISTRY.register(
    "approx_percentiles_lineitem",
    oracle=_APPROX_PCT_ORACLE,
    description="approx_percentile sketch with driver-checked error contract",
    tags=("aggregate", "percentile", "approx"),
)
def approx_percentiles_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    sketch = (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx(
                "l_extendedprice", [0.5, 0.9, 0.99], _APPROX_ACC
            ).alias("pcts"),
            F.count("*").alias("n"),
        )
        .select(
            "l_returnflag",
            F.col("pcts")[0].alias("p50"),
            F.col("pcts")[1].alias("p90"),
            F.col("pcts")[2].alias("p99"),
            "n",
        )
    )
    # second pass: the sketch answer's exact rank RANGE under ties —
    # min rank = count(value < answer) + 1, max rank = count(value <= answer).
    # GK guarantees only that SOME rank of the returned value is within
    # eps*n of q*n, so the contract holds when [min_rank, max_rank]
    # intersects [q*n - n/acc, q*n + n/acc]; a single max-rank test with a
    # +1 tie fudge mis-flags values with multiplicity > 2 at a boundary.
    # The sketch frame is per-group scalars -> broadcast, corpus unshuffled.
    def rank_aggs(col: str):
        lo = F.sum(
            F.when(F.col("l_extendedprice") < F.col(col), 1).otherwise(0)
        ) + F.lit(1)
        hi = F.sum(
            F.when(F.col("l_extendedprice") <= F.col(col), 1).otherwise(0)
        )
        return lo.alias(f"lo{col[1:]}"), hi.alias(f"hi{col[1:]}")

    ranked = (
        li.join(F.broadcast(sketch), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            *rank_aggs("p50"),
            *rank_aggs("p90"),
            *rank_aggs("p99"),
            F.first("n").alias("n"),
        )
    )
    # n/acc is the GK epsilon*n budget; +1 absorbs the integer rounding of
    # rank targets (the guarantee is on ceil'd ranks — at sf0.01 eps*n is
    # 1.99 and a legitimate answer sits exactly 2 ranks off). The tie
    # handling now lives in the [lo, hi] interval, not in this constant.
    tol = F.col("n") / F.lit(_APPROX_ACC) + F.lit(1)

    def ok(suffix: str, q: float) -> F.Column:
        target = F.col("n") * F.lit(q)
        return (F.col(f"lo{suffix}") <= target + tol) & (
            F.col(f"hi{suffix}") >= target - tol
        )

    return (
        ranked.select(
            "l_returnflag",
            "n",
            ok("50", 0.5).alias("p50_ok"),
            ok("90", 0.9).alias("p90_ok"),
            ok("99", 0.99).alias("p99_ok"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Winsorized statistics: clip a metric at its per-group p01/p99 before
# aggregating — the standard outlier-robust cleaning step before a metric
# feeds sampling weights or quality scores.
#
# Engine-portable by construction (r04 post-mortem + ADVICE r04: the
# interpolated quantile_cont cuts plus round(x,2) clipping landed on
# .005 half-boundaries where Spark's HALF_UP and DuckDB's nearbyint
# disagree, flipping both n_clipped and the hash): the metric is integer
# CENTS (o_totalprice is a 2-decimal quantity; *100 sits ~4e-9 off the
# integer grid, so both engines' round() agree), and the cuts are exact
# ORDER STATISTICS — the cents value at rank ceil(0.01*n) / ceil(0.99*n)
# — instead of interpolated quantiles. All emitted stats are integers;
# means are floor-scaled via integer division (1e-4 dollar units).
#
# 100 TB shape: one window pass + one aggregation over the same
# o_orderpriority hash partitioning (the cuts frame is |groups| rows,
# broadcast back); the clip itself is codegen'd per-row integer math.
# ---------------------------------------------------------------------------

_WINSOR_ORACLE = """
WITH cents AS (
  SELECT o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
),
ranked AS (
  SELECT o_orderpriority, c,
         row_number() OVER (PARTITION BY o_orderpriority ORDER BY c) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM cents
),
cuts AS (
  SELECT o_orderpriority,
         min(CASE WHEN rn = (n + 99) // 100 THEN c END) AS p01c,
         min(CASE WHEN rn = (99 * n + 99) // 100 THEN c END) AS p99c
  FROM ranked
  GROUP BY o_orderpriority
)
SELECT r.o_orderpriority,
       count(*) AS n,
       CAST(sum(r.c) AS BIGINT) AS sum_raw_cents,
       CAST(sum(least(greatest(r.c, k.p01c), k.p99c)) AS BIGINT)
           AS sum_wins_cents,
       CAST((sum(r.c) * 100) // count(*) AS BIGINT) AS mean_raw_q4,
       CAST((sum(least(greatest(r.c, k.p01c), k.p99c)) * 100) // count(*)
           AS BIGINT) AS mean_wins_q4,
       CAST(sum(CASE WHEN r.c < k.p01c OR r.c > k.p99c THEN 1 ELSE 0 END)
           AS BIGINT) AS n_clipped
FROM ranked r JOIN cuts k ON r.o_orderpriority = k.o_orderpriority
GROUP BY r.o_orderpriority
ORDER BY r.o_orderpriority
"""


@REGISTRY.register(
    "winsorized_price_stats",
    oracle=_WINSOR_ORACLE,
    headline=True,
    description="rank-based p01/p99-winsorized sums and floor-means per order priority, integer cents",
    tags=("aggregate", "percentile", "cleaning"),
)
def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c"),
    )
    wspec = Window.partitionBy("o_orderpriority").orderBy("c")
    ranked = o.withColumn("rn", F.row_number().over(wspec)).withColumn(
        "n", F.count("*").over(Window.partitionBy("o_orderpriority"))
    )
    cuts = ranked.groupBy("o_orderpriority").agg(
        F.min(F.when(F.col("rn") == F.expr("(n + 99) DIV 100"), F.col("c"))).alias("p01c"),
        F.min(F.when(F.col("rn") == F.expr("(99 * n + 99) DIV 100"), F.col("c"))).alias("p99c"),
    )
    wc = "least(greatest(c, p01c), p99c)"
    return (
        ranked.join(F.broadcast(cuts), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum("c").alias("sum_raw_cents"),
            F.expr(f"sum({wc})").alias("sum_wins_cents"),
            F.expr("sum(c) * 100 DIV count(*)").alias("mean_raw_q4"),
            F.expr(f"sum({wc}) * 100 DIV count(*)").alias("mean_wins_q4"),
            F.sum(
                F.when(
                    (F.col("c") < F.col("p01c")) | (F.col("c") > F.col("p99c")),
                    1,
                ).otherwise(0)
            ).alias("n_clipped"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# ANSI-safe arithmetic surface: Spark 4 runs with ANSI semantics, where
# dividing by zero is an ERROR — try_divide is the per-row safety valve
# that degrades to NULL instead of failing the job (the behavior every
# large pipeline wants for dirty denominators). The divisor
# (l_linenumber - 1) is zero on every order's first line BY CONSTRUCTION,
# so the NULL path is exercised on every fixture generation, not by data
# luck. Emissions are engine-exact: the per-row floor of an
# exact-int64-over-exact-int64 IEEE division is the same double in both
# engines, and the summed floors are int64.
# ---------------------------------------------------------------------------

_TRY_ARITH_ORACLE = """
SELECT l_returnflag,
       count(*) AS n_rows,
       CAST(sum(CASE WHEN l_linenumber = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_null_safe,
       CAST(sum(CASE WHEN l_linenumber > 1
                     THEN CAST(floor(CAST(round(l_extendedprice * 100, 0)
                                          AS BIGINT)
                                     / (l_linenumber - 1)) AS BIGINT)
                END) AS BIGINT) AS sum_floor_ratio
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@REGISTRY.register(
    "try_arithmetic_surface",
    oracle=_TRY_ARITH_ORACLE,
    description="try_divide under ANSI mode: zero divisors degrade to NULL, not job failure",
    tags=("scalar", "ansi", "error-handling"),
)
def try_arithmetic_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linenumber", "l_extendedprice"
    )
    ratio = F.expr(
        "try_divide("
        "cast(round(l_extendedprice * 100, 0) as bigint), l_linenumber - 1)"
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(
                F.when(F.col("l_linenumber") == 1, 1).otherwise(0)
            ).alias("n_null_safe"),
            F.sum(F.floor(ratio).cast("long")).alias("sum_floor_ratio"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Aggregate FILTER clause + GROUP BY ALL / ORDER BY ALL: the modern ANSI
# / analyst-SQL conveniences both engines implement — conditional
# aggregates without CASE scaffolding, and grouping keys inferred from
# the select list. Run as literal SQL on BOTH sides so the PARSER
# surface (not a DataFrame rewrite of it) is what the hash certifies.
# Emissions are counts and integer cents only.
# ---------------------------------------------------------------------------

_FILTER_CLAUSE_SQL = """
SELECT l_returnflag,
       l_linestatus,
       count(*) AS n_rows,
       count(*) FILTER (WHERE l_quantity >= 25) AS n_bulk,
       count(*) FILTER (WHERE l_discount = 0) AS n_undiscounted,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
            FILTER (WHERE l_quantity >= 25) AS BIGINT) AS bulk_cents
FROM lineitem
GROUP BY ALL
ORDER BY ALL
"""


@REGISTRY.register(
    "filter_clause_group_by_all",
    oracle=_FILTER_CLAUSE_SQL,
    description="aggregate FILTER clause with GROUP BY ALL / ORDER BY ALL (same SQL, both engines)",
    tags=("sql", "aggregate", "filter-clause"),
)
def filter_clause_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_filter_v"
    )
    return spark.sql(_FILTER_CLAUSE_SQL.replace("lineitem", "lineitem_filter_v"))
