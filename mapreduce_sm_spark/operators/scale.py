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

from pyspark.sql import DataFrame, SparkSession
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
