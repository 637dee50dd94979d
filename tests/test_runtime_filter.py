"""Runtime bloom-filter join pruning: Catalyst injects a
might_contain(bloom) predicate on the probe side of a shuffle join when
the build side is selective — the runtime analogue of static predicate
pushdown, and (with AQE) the mechanism that saves a 100 TB probe-side
scan from shuffling rows a selective dimension filter will discard.

Local caveat encoded here: the application-side threshold defaults to
10 GB precisely so tiny scans don't pay bloom-build cost — the test
lowers it to 0 to observe the plan shape, then restores every conf."""

from __future__ import annotations

from pyspark.sql import functions as F

_SF = "/root/testdata/sf0.1"
_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
}


def test_bloom_filter_injected_for_selective_shuffle_join(spark):
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    saved = {}
    for k, v in _CONFS.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 — unset conf
            saved[k] = None
        spark.conf.set(k, v)
    try:
        li = spark.read.parquet(f"{_SF}/lineitem.parquet")
        o = spark.read.parquet(f"{_SF}/orders.parquet").filter(
            F.col("o_totalprice") > 450000
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, "no runtime bloom filter injected"
        # the filter must sit on the PROBE (lineitem) side
        probe_line = next(
            ln for ln in plan.splitlines() if "might_contain" in ln
        )
        assert "l_orderkey" in probe_line
        # and the result must equal the un-filtered-plan answer
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
        )
        j2 = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        assert sorted(map(tuple, j.collect())) == sorted(
            map(tuple, j2.collect())
        )
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        )
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dynamic_partition_pruning_on_partitioned_write(spark, tmp_path):
    """The third pruning layer (SCALING.md): a partitioned fact table
    joined to a filtered dim gets a dynamicpruning subquery on its
    partition column, so only the matching partition directories are
    scanned — at 100 TB this is the difference between reading one
    day/priority and reading the table."""
    from pyspark.sql import functions as F

    o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    fact_dir = str(tmp_path / "fact")
    o.write.partitionBy("o_orderpriority").mode("overwrite").parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    dim = spark.createDataFrame(
        [("1-URGENT", 1), ("2-HIGH", 2)], "prio string, w int"
    ).filter(F.col("w") == 1)
    j = fact.join(dim, fact.o_orderpriority == dim.prio).agg(
        F.count("*").alias("n")
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), "no DPP subquery on the scan"
    expected = o.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert j.collect()[0]["n"] == expected
