"""Window (analytic) functions — absent from the reference (SURVEY §2.B).

Ranking, running frames, and lag/lead. Every ORDER BY inside a window has a
deterministic tiebreak column so results are reproducible and oracle-stable.

100 TB: a window = one shuffle on partitionBy keys + per-partition sort.
Partition keys here (customer, user) are high-cardinality so the state per
key is small; skewed users would be handled by AQE or pre-bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduce_sm_spark.operators._parity import date_str, date_str_sql
from mapreduce_sm_spark.registry import REGISTRY
from mapreduce_sm_spark.session import table

_RANK_ORACLE = """
SELECT c_custkey AS custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
)
WHERE rn <= 3
ORDER BY custkey, rn
"""


@REGISTRY.register(
    "window_rank_top_orders",
    oracle=_RANK_ORACLE,
    description="row_number ranking: top-3 orders per customer",
    headline=True,
    tags=("window",),
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    )
    return (
        table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("custkey", "rn")
    )


_RUNNING_ORACLE = f"""
SELECT o_custkey AS custkey, o_orderkey,
       {date_str_sql('o_orderdate')} AS odate,
       round((CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
             OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING) AS VARCHAR))::DOUBLE, 2) AS running_total
FROM orders
ORDER BY custkey, odate, o_orderkey
"""


@REGISTRY.register(
    "window_running_total",
    oracle=_RUNNING_ORACLE,
    description="cumulative sum frame per customer over order date",
    tags=("window",),
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("custkey"),
            "o_orderkey",
            date_str("o_orderdate").alias("odate"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast(
                    "double"
                ),
                2,
            ).alias("running_total"),
        )
        .orderBy("custkey", "odate", "o_orderkey")
    )


# delta_value is the RAW IEEE difference — both engines subtract the same
# two parquet doubles, so the bits agree without any rounding; a round(x, 6)
# here would *introduce* the scaled-round tie divergence (PLANS.md r05) on
# any future fixture whose values leave the 2-decimal grid.
_LAG_ORACLE = """
SELECT user_id, event_id,
       lag(event_type)  OVER w AS prev_type,
       lead(event_type) OVER w AS next_type,
       value - coalesce(lag(value) OVER w, 0.0) AS delta_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, event_id
"""


@REGISTRY.register(
    "window_lag_lead_events",
    oracle=_LAG_ORACLE,
    description="lag/lead navigation over per-user event streams",
    tags=("window",),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
            (
                F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0.0))
            ).alias("delta_value"),
        )
        .orderBy("user_id", "event_id")
    )


# Engine-portable by construction: a double avg() over a sliding frame
# depends on the engine's window-sum internals (DuckDB uses a segment
# tree for sliding frames — a different accumulation ORDER than a
# sequential fold), so the emitted double is only empirically identical.
# Summing integer CENTS over the same frame is exact under any
# accumulation order, and the mean is emitted as an exact integer floor
# division in 1e-4-dollar units — the winsorize discipline, keeping the
# ROWS BETWEEN frame this query exists to exercise.
_MOVAVG_ORACLE = """
WITH cents AS (
  SELECT user_id, event_id, ts,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
)
SELECT user_id, event_id,
       CAST((sum(c) OVER w * 100)
           // (count(*) OVER w) AS BIGINT) AS mov_avg3_q4
FROM cents
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
"""


@REGISTRY.register(
    "window_moving_avg",
    oracle=_MOVAVG_ORACLE,
    description="3-row moving-average frame per user, exact 1e-4-dollar integers",
    tags=("window",),
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        table(spark, sf_dir, "events")
        .withColumn("c", F.round(F.col("value") * 100, 0).cast("long"))
        .withColumn("sc", F.sum("c").over(w))
        .withColumn("cn", F.count("*").over(w))
        .select(
            "user_id",
            "event_id",
            F.expr("(sc * 100) div cn").alias("mov_avg3_q4"),
        )
        .orderBy("user_id", "event_id")
    )


# ---------------------------------------------------------------------------
# distribution / navigation window functions: ntile, percent_rank,
# cume_dist, first/last value over a running frame. Same single-shuffle
# scale shape as the ranking query.
# ---------------------------------------------------------------------------

_DISTRIB_ORACLE = """
SELECT o_orderkey, o_orderpriority,
       ntile(4) OVER w AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume,
       first_value(o_orderkey) OVER w AS first_key,
       last_value(o_orderkey) OVER (PARTITION BY o_orderpriority
           ORDER BY o_totalprice ASC, o_orderkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice ASC, o_orderkey ASC)
ORDER BY o_orderpriority, o_totalprice, o_orderkey
LIMIT 1000
"""


@REGISTRY.register(
    "window_distribution_funcs",
    oracle=_DISTRIB_ORACLE,
    description="ntile/percent_rank/cume_dist/first/last_value window surface",
    tags=("window",),
)
def window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        orders.select(
            "o_orderkey",
            "o_orderpriority",
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.first("o_orderkey").over(w).alias("first_key"),
            F.last("o_orderkey").over(w_full).alias("last_key"),
        )
        .orderBy("o_orderpriority", F.col("pct_rank").asc(), "o_orderkey")
        .limit(1000)
    )


# ---------------------------------------------------------------------------
# time-RANGE window frame: events within the preceding hour of each event
# (RANGE frames bound by VALUE distance, unlike ROWS frames' row counts).
# Spark's rangeBetween needs a numeric ordering column -> epoch seconds;
# the oracle uses the equivalent RANGE BETWEEN on the same integer.
# ---------------------------------------------------------------------------

_RANGE_FRAME_ORACLE = """
SELECT event_id, user_id,
       count(*) OVER (PARTITION BY user_id ORDER BY epoch(ts)::BIGINT
                      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_last_hour,
       (CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
            PARTITION BY user_id ORDER BY epoch(ts)::BIGINT
            RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS VARCHAR))::DOUBLE
         AS value_last_hour
FROM events
ORDER BY event_id
"""


@REGISTRY.register(
    "window_time_range_frame",
    oracle=_RANGE_FRAME_ORACLE,
    description="RANGE window frame: rolling 1-hour per-user totals by value distance",
    tags=("window", "range-frame"),
)
def window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").withColumn(
        "ts_s", F.unix_timestamp("ts").cast("long")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_s")
        .rangeBetween(-3600, Window.currentRow)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.count("*").over(w).alias("n_last_hour"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .over(w)
            .cast("double")
            .alias("value_last_hour"),
        )
        .orderBy("event_id")
    )
