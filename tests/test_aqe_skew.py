"""AQE skew-join handling, plan-asserted.

The repo's scale posture leans on two skew answers: deterministic
salting (skew_salted_agg — exact, engine-independent) and AQE's runtime
skew-join split (spark.sql.adaptive.skewJoin). The salting path is
oracle-verified; this test pins the AQE path: build a join whose left
side is pathologically skewed (one key holds ~all rows), force a
sort-merge join, and assert the executed post-AQE plan actually marked
the join skew=true (OptimizeSkewedJoin split the hot partition). This
is the mechanism a 1000-executor cluster relies on when salting wasn't
pre-applied — worth a regression pin, not an assumption.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_sort_merge_join(spark):
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # shrink thresholds so the fixture-sized hot partition qualifies
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.shuffle.partitions": "8",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # left: 400k rows, 99%+ on key 7 (hot); right: uniform dim
        left = spark.range(0, 400_000).select(
            F.when(F.col("id") % 100 < 99, F.lit(7))
            .otherwise(F.col("id") % 50)
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        right = spark.range(0, 50).select(
            F.col("id").alias("k"), F.lit("dim").alias("tag")
        )
        # the aggregate must CONSUME payload: a count-only agg lets column
        # pruning strip the incompressible sha2 column from the left
        # shuffle, and the remaining 396k near-constant key longs LZ4-
        # compress to UNDER the 64KB skew threshold — AQE then correctly
        # declines to mark the join skewed and the test pinned a
        # compressed-size boundary, not the skew mechanism (it flipped
        # between sittings in r10). Keeping payload in the shuffle makes
        # the hot partition ~27MB of incompressible bytes, far above any
        # threshold drift.
        j = (
            left.join(right, "k")
            .groupBy("tag")
            .agg(F.count("*").alias("count"), F.max("payload").alias("pmax"))
        )
        rows = j.collect()
        assert rows and rows[0]["count"] == 400_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:800]
        assert "skew=true" in plan, (
            "AQE did not mark the skewed join — skew-split regression:\n"
            + plan[:1200]
        )
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
