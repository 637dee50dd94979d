"""Skew-safe aggregation patterns for 100 TB inputs.

Hot grouping keys (one user generating 1% of all events) make one shuffle
partition the straggler. Two defenses, both shown here:
  - AQE skew handling (on in session.py) splits oversized partitions for
    JOINS, but a skewed AGGREGATE key still funnels one key's partials to
    one reducer;
  - salting splits each key into SALT_BUCKETS sub-keys for the first
    (heavy) aggregation, then a second (tiny) aggregation over per-salt
    partials removes the salt. Exact same result as the direct group-by —
    which is what the oracle checks.

The partial sums are decimal, so re-aggregating partials is exact and
order-independent (a double two-stage sum would drift vs the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_sm_spark.registry import REGISTRY
from mapreduce_sm_spark.session import table

SALT_BUCKETS = 16

_SALTED_ORACLE = """
SELECT user_id,
       count(*) AS n_events,
       (CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR))::DOUBLE AS total_value,
       max(value) AS max_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


@REGISTRY.register(
    "skew_salted_agg",
    oracle=_SALTED_ORACLE,
    description="two-stage salted aggregation (skew-safe group-by, exact result)",
    tags=("aggregate", "skew", "scale"),
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    # stage 1: spread each user over SALT_BUCKETS sub-keys; the shuffle for
    # this aggregate sees at most 1/SALT_BUCKETS of any hot key per reducer.
    # The salt is a DETERMINISTIC function of the row (not rand()): with a
    # nondeterministic salt, a retried map task re-salts differently and
    # partially-refetched shuffles can double-count (SPARK-23207 class).
    salted = ev.withColumn("salt", F.pmod("event_id", F.lit(SALT_BUCKETS)))
    partials = salted.groupBy("user_id", "salt").agg(
        F.count("*").alias("pn"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("psum"),
        F.max("value").alias("pmax"),
    )
    # stage 2: <= SALT_BUCKETS rows per user; all partials are algebraic so
    # the merge is exact
    return (
        partials.groupBy("user_id")
        .agg(
            F.sum("pn").alias("n_events"),
            F.sum("psum").cast("double").alias("total_value"),
            F.max("pmax").alias("max_value"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Key-skew diagnostics: the report that tells you WHEN to deploy the
# salting above. For each (table, key) pair it measures the key-frequency
# distribution — max and p99 group sizes, the hottest key, and
# max-over-mean in exact milli-units.
#
# Scale shape: the only corpus-sized operation is the per-key count (one
# partial-aggregable shuffle). Everything downstream runs on the
# COUNT-OF-COUNTS histogram — one row per distinct group size, a long-tail
# domain that stays tiny however large the table — so the p99 order
# statistic needs no global sort of the keys (same two-phase trick as
# sharding.doc_length_deciles; the oracle uses the direct row_number
# form). The hottest key falls out of a single max(struct(cnt, -key))
# aggregate: deterministic on ties (smallest key wins), no second scan.
# All emitted values are integers.
# ---------------------------------------------------------------------------


def _skew_oracle_block(table_name: str, key: str) -> str:
    return f"""
SELECT '{table_name}.{key}' AS keyed_table,
       (SELECT CAST(sum(cnt) AS BIGINT) FROM c_{table_name}) AS n_rows,
       (SELECT count(*) FROM c_{table_name}) AS n_keys,
       (SELECT max(cnt) FROM c_{table_name}) AS max_key_rows,
       (SELECT cnt FROM r_{table_name}
         WHERE rn = (99 * m + 99) // 100) AS p99_key_rows,
       (SELECT min(k) FROM c_{table_name}
         WHERE cnt = (SELECT max(cnt) FROM c_{table_name})) AS top_key,
       (SELECT CAST(max(cnt) * count(*) * 1000 // sum(cnt) AS BIGINT)
          FROM c_{table_name}) AS max_over_mean_x1000
WHERE (SELECT count(*) FROM c_{table_name}) > 0
"""


_SKEW_ORACLE = f"""
WITH c_lineitem AS (
  SELECT l_orderkey AS k, count(*) AS cnt FROM lineitem GROUP BY l_orderkey
),
r_lineitem AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt, k) AS rn,
         count(*) OVER () AS m
  FROM c_lineitem
),
c_events AS (
  SELECT user_id AS k, count(*) AS cnt FROM events GROUP BY user_id
),
r_events AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt, k) AS rn,
         count(*) OVER () AS m
  FROM c_events
)
{_skew_oracle_block("lineitem", "l_orderkey")}
UNION ALL
{_skew_oracle_block("events", "user_id")}
ORDER BY keyed_table
"""


def _skew_report(df, key: str, label: str):
    counts = df.groupBy(key).agg(F.count("*").alias("cnt"))
    # count-of-counts histogram: one row per distinct group size, carrying
    # the smallest key at each size so the hottest key survives the fold
    freq = counts.groupBy("cnt").agg(
        F.count("*").alias("nk"), F.min(key).alias("min_k")
    )
    wcum = Window.orderBy("cnt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # every global statistic folds out of the SAME tiny frame via
    # whole-frame windows — one scan of the base table total; separate
    # counts.agg(...) subtrees would each re-scan it
    whole = Window.partitionBy(F.lit(1))
    g = (
        freq.withColumn("cum", F.sum("nk").over(wcum))
        .withColumn("n_keys", F.max(F.col("cum")).over(whole))
        .withColumn("n_rows", F.sum(F.col("cnt") * F.col("nk")).over(whole))
        .withColumn("max_cnt", F.max("cnt").over(whole))
    )
    # p99 order statistic: the group size at key-rank ceil(0.99 * n_keys)
    # = the smallest cnt whose cumulative key count reaches that rank
    return (
        g.agg(
            F.min("n_rows").alias("n_rows"),
            F.min("n_keys").alias("n_keys"),
            F.min("max_cnt").alias("max_key_rows"),
            F.min(
                F.when(
                    F.col("cum") >= F.expr("(99 * n_keys + 99) DIV 100"),
                    F.col("cnt"),
                )
            ).alias("p99_key_rows"),
            F.min(
                F.when(F.col("cnt") == F.col("max_cnt"), F.col("min_k"))
            ).alias("top_key"),
        )
        .filter(F.col("n_rows").isNotNull())  # empty table -> zero rows
        .select(
            F.lit(label).alias("keyed_table"),
            "n_rows",
            "n_keys",
            "max_key_rows",
            "p99_key_rows",
            "top_key",
            F.expr("max_key_rows * n_keys * 1000 DIV n_rows").alias(
                "max_over_mean_x1000"
            ),
        )
    )


@REGISTRY.register(
    "key_skew_diagnostics",
    oracle=_SKEW_ORACLE,
    description="per-key frequency skew report (max/p99/hottest key) via count-of-counts histogram",
    tags=("skew", "scale", "profiling"),
)
def key_skew_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_orderkey")
    ev = table(spark, sf_dir, "events").select("user_id")
    return (
        _skew_report(li, "l_orderkey", "lineitem.l_orderkey")
        .unionAll(_skew_report(ev, "user_id", "events.user_id"))
        .orderBy("keyed_table")
    )
