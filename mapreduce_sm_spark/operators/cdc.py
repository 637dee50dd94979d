"""CDC-style MERGE (upsert) expressed on plain Spark (§2.B completion).

Engines with table formats get `MERGE INTO`; on bare parquet the same
semantics are one full-outer join on the key with column-wise COALESCE:
  - key in both          -> the change row wins (UPDATE)
  - key only in changes  -> the change row is appended (INSERT)
  - key only in base     -> the base row is kept
The change feed here is derived deterministically from the orders table
itself (keys %7==0 become updates, %13==0 spawn inserts under shifted
keys), so the oracle can rebuild the identical feed.

100 TB posture: one shuffle join keyed on o_orderkey. A real change feed
is orders of magnitude smaller than the base snapshot, so AQE broadcasts
it and the base table never shuffles; for repeated merges, bucket the
base snapshot on the key (sources/sinks.py::write_bucketed_table) and
the join is exchange-free on the base side. No window functions, no
driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_sm_spark.operators._parity import date_str, date_str_sql
from mapreduce_sm_spark.registry import REGISTRY
from mapreduce_sm_spark.session import table

_MERGE_ORACLE = f"""
WITH changes AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
         o_totalprice + 100.0 AS o_totalprice, o_orderdate
  FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey + 100000000 AS o_orderkey, o_custkey,
         'I' AS o_orderstatus, o_totalprice, o_orderdate
  FROM orders WHERE o_orderkey % 13 = 0
)
SELECT coalesce(c.o_orderkey, b.o_orderkey) AS o_orderkey,
       coalesce(c.o_custkey, b.o_custkey) AS o_custkey,
       coalesce(c.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
       coalesce(c.o_totalprice, b.o_totalprice) AS o_totalprice,
       {date_str_sql('coalesce(c.o_orderdate, b.o_orderdate)')} AS o_orderdate
FROM orders b FULL OUTER JOIN changes c ON b.o_orderkey = c.o_orderkey
ORDER BY o_orderkey
"""


@REGISTRY.register(
    "merge_upsert_orders",
    oracle=_MERGE_ORACLE,
    description="CDC MERGE semantics: full-outer join + coalesce = upsert snapshot",
    tags=("join", "cdc"),
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    updates = base.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") + F.lit(100.0)).alias("o_totalprice"),
        "o_orderdate",
    )
    inserts = base.filter(F.col("o_orderkey") % 13 == 0).select(
        (F.col("o_orderkey") + F.lit(100000000)).alias("o_orderkey"),
        "o_custkey",
        F.lit("I").alias("o_orderstatus"),
        "o_totalprice",
        "o_orderdate",
    )
    changes = updates.unionByName(inserts)
    b, c = base.alias("b"), changes.alias("c")
    merged = b.join(
        c, F.col("b.o_orderkey") == F.col("c.o_orderkey"), "full_outer"
    )
    pick = lambda col: F.coalesce(F.col(f"c.{col}"), F.col(f"b.{col}"))
    return merged.select(
        pick("o_orderkey").alias("o_orderkey"),
        pick("o_custkey").alias("o_custkey"),
        pick("o_orderstatus").alias("o_orderstatus"),
        pick("o_totalprice").alias("o_totalprice"),
        date_str(pick("o_orderdate")).alias("o_orderdate"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# Merge audit: the counts every CDC job emits alongside the merged
# snapshot — how many keys were updated / inserted / untouched, and the
# money delta the updates introduced. Same deterministic change feed as
# merge_upsert_orders; the audit is one aggregation over the same
# full-outer join (exact decimal sums for the delta).
# ---------------------------------------------------------------------------

_MERGE_AUDIT_ORACLE = """
WITH changes AS (
  SELECT o_orderkey, o_totalprice + 100.0 AS new_price, o_totalprice AS old_price_hint
  FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey + 100000000, o_totalprice, NULL
  FROM orders WHERE o_orderkey % 13 = 0
)
SELECT count(CASE WHEN b.o_orderkey IS NOT NULL AND c.o_orderkey IS NOT NULL
                  THEN 1 END) AS n_updated,
       count(CASE WHEN b.o_orderkey IS NULL THEN 1 END) AS n_inserted,
       count(CASE WHEN c.o_orderkey IS NULL THEN 1 END) AS n_unchanged,
       (CAST(sum(CASE WHEN b.o_orderkey IS NOT NULL AND c.o_orderkey IS NOT NULL
                 THEN CAST(c.new_price - b.o_totalprice AS DECIMAL(18,2))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS VARCHAR))::DOUBLE
           AS updated_price_delta
FROM orders b FULL OUTER JOIN changes c ON b.o_orderkey = c.o_orderkey
"""


@REGISTRY.register(
    "cdc_merge_audit",
    oracle=_MERGE_AUDIT_ORACLE,
    description="CDC merge audit: updated/inserted/unchanged counts + exact price delta",
    tags=("cdc", "aggregate"),
)
def cdc_merge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    updates = base.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey", (F.col("o_totalprice") + 100.0).alias("new_price")
    )
    inserts = base.filter(F.col("o_orderkey") % 13 == 0).select(
        (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
        F.col("o_totalprice").alias("new_price"),
    )
    changes = updates.unionAll(inserts)
    j = base.alias("b").join(
        changes.alias("c"),
        F.col("b.o_orderkey") == F.col("c.o_orderkey"),
        "full_outer",
    )
    in_both = F.col("b.o_orderkey").isNotNull() & F.col("c.o_orderkey").isNotNull()
    delta = F.when(
        in_both,
        (F.col("c.new_price") - F.col("b.o_totalprice")).cast("decimal(18,2)"),
    ).otherwise(F.lit(0).cast("decimal(18,2)"))
    return j.agg(
        F.count(F.when(in_both, 1)).alias("n_updated"),
        F.count(F.when(F.col("b.o_orderkey").isNull(), 1)).alias("n_inserted"),
        F.count(F.when(F.col("c.o_orderkey").isNull(), 1)).alias("n_unchanged"),
        F.sum(delta).cast("double").alias("updated_price_delta"),
    )


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance (the materialized-view pattern): a
# kept aggregate STATE is advanced by merging the DELTA batch's partial
# aggregate — count/sum/min/max are mergeable, the mean derives at read
# time — instead of rescanning the base data. At 100 TB this is the
# difference between touching one day's partition and touching the lake:
# the merge is a full-outer join of two group-key-sized frames (KBs),
# never a fact scan. The oracle aggregates the WHOLE table directly, so
# the hash proves merged-partials == full-recompute exactly: integer
# cents and a floor-divided mean keep every emitted value engine-exact.
# ---------------------------------------------------------------------------

_INCR_AGG_ORACLE = """
SELECT o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS total_cents,
       min(o_orderkey) AS min_key,
       max(o_orderkey) AS max_key,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           // count(*) AS avg_cents_floor
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def _partial_order_agg(df: DataFrame) -> DataFrame:
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return df.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.sum(cents).alias("cents"),
        F.min("o_orderkey").alias("mn"),
        F.max("o_orderkey").alias("mx"),
    )


@REGISTRY.register(
    "incremental_agg_maintenance",
    oracle=_INCR_AGG_ORACLE,
    description="mergeable partial aggregates: state + delta merge == full recompute",
    tags=("cdc", "aggregate", "incremental", "scale"),
)
def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderkey", "o_totalprice"
    )
    # the kept state (80% of keys) and the arriving delta batch (20%)
    state = _partial_order_agg(o.filter(F.col("o_orderkey") % 5 != 0))
    delta = _partial_order_agg(o.filter(F.col("o_orderkey") % 5 == 0))
    s = state.select(
        F.col("o_orderstatus"),
        F.col("n").alias("sn"),
        F.col("cents").alias("sc"),
        F.col("mn").alias("smn"),
        F.col("mx").alias("smx"),
    )
    d = delta.select(
        F.col("o_orderstatus"),
        F.col("n").alias("dn"),
        F.col("cents").alias("dc"),
        F.col("mn").alias("dmn"),
        F.col("mx").alias("dmx"),
    )
    merged = s.join(d, "o_orderstatus", "full_outer").select(
        "o_orderstatus",
        (F.coalesce("sn", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias(
            "n_orders"
        ),
        (F.coalesce("sc", F.lit(0)) + F.coalesce("dc", F.lit(0))).alias(
            "total_cents"
        ),
        F.least("smn", "dmn").alias("min_key"),  # least/greatest skip NULLs
        F.greatest("smx", "dmx").alias("max_key"),
    )
    return merged.select(
        "o_orderstatus",
        "n_orders",
        "total_cents",
        "min_key",
        "max_key",
        F.expr("total_cents div n_orders").alias("avg_cents_floor"),
    ).orderBy("o_orderstatus")
