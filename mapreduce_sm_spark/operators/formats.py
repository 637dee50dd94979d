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
    import tempfile

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    # session-lived tmpdir: the detour must outlive this lazy DataFrame
    # (same rationale as custom_source_roundtrip, wordcount.py)
    d = tempfile.mkdtemp(prefix="schema_evo_")
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
