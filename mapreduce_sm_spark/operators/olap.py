"""OLAP reporting shapes: GROUPING SETS with grouping_id, conditional
(CASE) bucket aggregation, and conditional-ratio aggregates (TPC-H Q12/Q14
shapes). All single-shuffle partial+final aggregates at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_sm_spark.registry import REGISTRY
from mapreduce_sm_spark.session import table

# ---------------------------------------------------------------------------
# GROUPING SETS with an explicit grouping_id: totals by (status, priority),
# by status alone, and grand total — one pass, no self-union.
# Spark's DataFrame API exposes rollup/cube only; arbitrary grouping sets
# are the SQL surface, which is itself part of the engine's API
# (spark.sql over a registered view).
# ---------------------------------------------------------------------------

_GSETS_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       GROUPING(o_orderstatus, o_orderpriority) AS gid,
       count(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


@REGISTRY.register(
    "grouping_sets_orders",
    oracle=_GSETS_ORACLE,
    description="arbitrary GROUPING SETS + grouping_id in one aggregation pass",
    tags=("aggregate", "grouping-sets", "sql"),
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gsets_v")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               grouping_id(o_orderstatus, o_orderpriority) AS gid,
               count(*) AS n
        FROM orders_gsets_v
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


# ---------------------------------------------------------------------------
# Conditional bucket aggregation (TPC-H Q12 shape, adapted: the fixture
# lineitem has no shipmode, so bucket orders by status): urgency split per
# order status via CASE inside SUM.
# ---------------------------------------------------------------------------

# Both sums are pinned to BIGINT: DuckDB's sum(int) yields HUGEINT, Spark's
# yields bigint — the driver canonicalizes values per-engine, so the type
# must agree for the hash to match (round-1 red row).
_CASE_ORACLE = """
SELECT o_orderstatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@REGISTRY.register(
    "case_bucket_orders",
    oracle=_CASE_ORACLE,
    description="CASE-bucketed conditional counts (TPC-H Q12 shape)",
    tags=("aggregate", "conditional"),
)
def case_bucket_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Conditional-ratio aggregate (TPC-H Q14 shape): PROMO revenue share.
# Join prunes part to (p_partkey, p_type); at 100 TB AQE broadcasts the
# dimension side when it fits, else shuffle-hash on partkey.
# ---------------------------------------------------------------------------

# Engine-portable by construction (r05): the share is emitted as an exact
# integer — ppm of percent — via truncating division of the exact
# 1e-6-dollar integer revenue sums, instead of round(double_ratio, 6)
# whose scaled-round ties can split between engines (PLANS.md r05).
_PROMO_ORACLE = """
WITH t AS (
  SELECT CAST(round(l_extendedprice * 100) AS HUGEINT)
             * (10000 - CAST(round(l_discount * 10000) AS BIGINT)) AS dp,
         p_type
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
)
SELECT CAST((100000000::HUGEINT
             * sum(CASE WHEN p_type = 'PROMO' THEN dp ELSE 0 END))
            // sum(dp) AS BIGINT) AS promo_revenue_pct_ppm
FROM t
"""


@REGISTRY.register(
    "promo_revenue_ratio",
    oracle=_PROMO_ORACLE,
    description="conditional revenue share (TPC-H Q14 shape)",
    tags=("aggregate", "join", "conditional"),
)
def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_sm_spark.operators._parity import (
        disc_price_long,
    )

    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    joined = li.join(part, li.l_partkey == part.p_partkey).select(
        "p_type", "l_extendedprice", "l_discount"
    )
    lp = disc_price_long()
    # two-phase int64 partials -> exact decimal(38,0) totals (same shape as
    # two_phase_sums, but keeping the exact integers for the division)
    partials = joined.groupBy(F.spark_partition_id().alias("_p_")).agg(
        F.sum(F.when(F.col("p_type") == "PROMO", lp).otherwise(F.lit(0))).alias(
            "_sp"
        ),
        F.sum(lp).alias("_st"),
    )
    sums = partials.agg(
        F.sum(F.col("_sp").cast("decimal(38,0)")).alias("promo_rev"),
        F.sum(F.col("_st").cast("decimal(38,0)")).alias("total_rev"),
    )
    return sums.select(
        F.expr(
            "(CAST(100000000 AS DECIMAL(38,0)) * promo_rev) div total_rev"
        ).alias("promo_revenue_pct_ppm")
    )


# ---------------------------------------------------------------------------
# Fixed-width histogram: one partial+final aggregate over computed bin ids
# (the scalable histogram — never a sort, never a driver-side pass).
# ---------------------------------------------------------------------------

_HIST_WIDTH = 25.0

# lo/hi are RAW min/max doubles — both engines read the identical bits
# from parquet, so no round is needed and none is wanted: round(x, 2)
# would tie exactly on a .005-grid value where engine round conventions
# split (the r04 hash-red class). bin_lo multiplies in the DOUBLE domain
# on both sides (bin * 25.0 is exact; a decimal-typed product would pass
# only via the gate's decimal->float canon).

_HIST_ORACLE = f"""
SELECT bin, bin * CAST({_HIST_WIDTH} AS DOUBLE) AS bin_lo,
       count(*) AS n,
       min(value) AS lo,
       max(value) AS hi
FROM (
  SELECT floor(value / {_HIST_WIDTH})::BIGINT AS bin, value FROM events
)
GROUP BY bin
ORDER BY bin
"""


@REGISTRY.register(
    "histogram_event_values",
    oracle=_HIST_ORACLE,
    description="fixed-width histogram via computed-bin aggregation",
    tags=("aggregate", "histogram"),
)
def histogram_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    bin_col = F.floor(F.col("value") / _HIST_WIDTH).cast("long")
    return (
        ev.groupBy(bin_col.alias("bin"))
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .select(
            "bin",
            (F.col("bin") * _HIST_WIDTH).alias("bin_lo"),
            "n",
            "lo",
            "hi",
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# Deterministic mode (most frequent value, ties -> the largest value):
# count per (group, value), then max(struct(cnt, value)) — the argmax
# pattern; built-in mode() is tie-nondeterministic, this is pinned.
# ---------------------------------------------------------------------------

_MODE_ORACLE = """
WITH counts AS (
  SELECT user_id, event_type, count(*) AS cnt
  FROM events GROUP BY user_id, event_type
)
SELECT user_id, event_type AS mode_type, cnt AS mode_count
FROM (
  SELECT user_id, event_type, cnt,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY cnt DESC, event_type DESC) AS rn
  FROM counts
)
WHERE rn = 1
ORDER BY user_id
"""


@REGISTRY.register(
    "mode_event_type_per_user",
    oracle=_MODE_ORACLE,
    description="deterministic mode via max(struct(cnt, value)) argmax",
    tags=("aggregate", "argmax"),
)
def mode_event_type_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    return (
        counts.groupBy("user_id")
        .agg(F.max(F.struct("cnt", "event_type")).alias("s"))
        .select(
            "user_id",
            F.col("s.event_type").alias("mode_type"),
            F.col("s.cnt").alias("mode_count"),
        )
        .orderBy("user_id")
    )
