"""Schema evolution across parquet file generations (§2.B connector
surface — the reference engine, /root/reference/src/mapreduce.c:190-212,
reads exactly one schemaless text file; a real lake ingests years of
files whose schemas GREW, and the engine must read old and new
generations in one scan).

The registered query materializes the situation instead of assuming it:
it writes two parquet generations of the orders table — an old batch
missing the o_orderpriority column and a new batch carrying it — then
reads both through one mergeSchema scan. Old-generation rows surface the
added column as NULL; the aggregate pins that contract, the row split,
and the money totals. A reader that dropped the extra column, invented
non-null defaults, or lost a generation fails the exact hash.

100 TB posture: mergeSchema's footer reconciliation is a driver-side
metadata pass over file footers (cost ∝ file count, not bytes); the data
scan itself stays vectorized and column-pruned. For lakes with millions
of files, pin the merged schema in the catalog once instead of
re-merging per query — this operator is the ingest-time validation of
that pinned schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_sm_spark.registry import REGISTRY
from mapreduce_sm_spark.session import table

_ABSENT = "<pre-evolution>"

_SCHEMA_EVOLUTION_ORACLE = f"""
SELECT CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority
            ELSE '{_ABSENT}' END AS priority,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders
GROUP BY 1
ORDER BY priority
"""


@REGISTRY.register(
    "schema_evolution_stats",
    oracle=_SCHEMA_EVOLUTION_ORACLE,
    description="two parquet schema generations read through one mergeSchema scan",
    tags=("source", "parquet", "schema-evolution"),
)
def schema_evolution_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from mapreduce_sm_spark.session import session_tmpdir

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    # session-lived tmpdir (atexit-reclaimed): the detour must outlive
    # this lazy DataFrame (same rationale as custom_source_roundtrip)
    d = session_tmpdir("schema_evo_")
    old_gen = os.path.join(d, "gen1")
    new_gen = os.path.join(d, "gen2")
    orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    ).write.mode("overwrite").parquet(old_gen)
    orders.filter(F.col("o_orderkey") % 2 == 1).write.mode(
        "overwrite"
    ).parquet(new_gen)

    merged = spark.read.option("mergeSchema", "true").parquet(
        old_gen, new_gen
    )
    return (
        merged.groupBy(
            F.coalesce(F.col("o_orderpriority"), F.lit(_ABSENT)).alias(
                "priority"
            )
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("long")
            ).alias("total_cents"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# Formatted-number scalar surface (to_char / try_to_number): money renders
# through a '999,999,999.99' template into the space-padded, comma-grouped
# string a report or a legacy feed would carry, then parses back with
# try_to_number before aggregating — the parse-don't-trust path for
# numeric text columns. The detour is invisible to the oracle: a
# formatting or parsing defect (lost cents, swallowed grouping comma,
# silent NULL from try_) changes the counts or the cents total and fails
# the exact hash. Decimal in, decimal out: no double enters the detour.
# ---------------------------------------------------------------------------

_NUMBER_FORMAT = "999,999,999.99"

_NUMBER_ROUNDTRIP_ORACLE = """
SELECT o_orderstatus,
       count(*) AS n_parsed,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@REGISTRY.register(
    "number_format_roundtrip",
    oracle=_NUMBER_ROUNDTRIP_ORACLE,
    description="to_char -> try_to_number formatted-money round trip, integer-cents totals",
    tags=("scalar", "format", "roundtrip"),
)
def number_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_totalprice"
    )
    # The decimal fed to to_char is built FROM the integer cents — the
    # same round(x*100, 0) the oracle uses — never by casting the double
    # straight to DECIMAL(12,2): on a half-cent double the exact-expansion
    # HALF_UP cast and the scale-0 round of the product can disagree by
    # one cent (caught by tools/drift_probe.py's .005-tie orders fixture).
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    dec = (cents.cast("decimal(14,0)") / F.lit(100)).cast("decimal(12,2)")
    rendered = o.select(
        "o_orderstatus",
        F.to_char(dec, F.lit(_NUMBER_FORMAT)).alias("s"),
    )
    parsed = rendered.select(
        "o_orderstatus",
        F.try_to_number("s", F.lit(_NUMBER_FORMAT)).alias("v"),
    )
    return (
        parsed.groupBy("o_orderstatus")
        .agg(
            F.count("v").alias("n_parsed"),
            F.sum((F.col("v") * 100).cast("long")).alias("total_cents"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# ORC round trip (§2.B connector surface): the second first-class columnar
# format next to parquet. The query writes a projected lineitem slice to
# ORC (zlib, the Spark default), reads it back through the vectorized ORC
# reader with a predicate that must reach the scan as a PushedFilter
# (tests/test_sources.py asserts it plan-level), and aggregates with the
# repo's integer-cents discipline. A writer that lost precision on
# DECIMAL-as-double columns, dropped rows at stripe boundaries, or a
# reader that mis-applied the pushed predicate fails the exact hash.
#
# 100 TB posture: identical to the parquet path — ORC stripes give the
# same splittable, column-pruned, predicate-pushed scan; the detour
# volume here is one projected slice, written once and read once. The
# oracle never sees ORC: it recomputes from the canonical parquet, which
# is exactly what makes the round trip a round trip.
# ---------------------------------------------------------------------------

_ORC_ORACLE = """
SELECT l_returnflag,
       count(*) AS n_items,
       CAST(sum(l_quantity) AS BIGINT) AS total_qty,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS gross_cents
FROM lineitem
WHERE l_shipdate >= DATE '1995-06-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@REGISTRY.register(
    "orc_roundtrip_stats",
    oracle=_ORC_ORACLE,
    description="lineitem slice written to ORC, read back with pushed predicate, integer-cents rollup",
    tags=("source", "orc", "roundtrip"),
)
def orc_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from mapreduce_sm_spark.session import shared_tmpdir

    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_shipdate", "l_quantity", "l_extendedprice"
    )
    # shared (per-process, per-sf) dir: every write is mode("overwrite"), so
    # bench's cold+3-trial protocol reuses ONE on-disk copy instead of four
    # (ADVICE r08); keyed by sf_dir so two scale factors never share a store
    # that the lazy return DataFrame would read after a swap (ADVICE r09)
    d = os.path.join(
        shared_tmpdir("orc_rt_", sf_dir),
        "lineitem_orc",
    )
    li.write.mode("overwrite").orc(d)

    back = spark.read.orc(d).filter(F.col("l_shipdate") >= F.lit("1995-06-01").cast("date"))
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("l_quantity").cast("long").alias("total_qty"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("long")
            ).alias("gross_cents"),
        )
        .orderBy("l_returnflag")
    )
