"""Observation-API metrics and small-file compaction."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_observed_metrics_match_direct_aggregates(spark, tmp_path):
    from mapreduce_sm_spark.observability import observed, quality_metrics
    from mapreduce_sm_spark.session import table

    ev = table(spark, SF_DIR, "events")
    df, obs = observed(ev, "ingest", **quality_metrics("ts", "value"))
    df.write.format("noop").mode("overwrite").save()
    got = obs.get

    n = ev.count()
    assert got["n_rows"] == n
    assert got["n_null_ts"] == n - ev.filter(F.col("ts").isNotNull()).count()
    assert got["n_null_value"] == n - ev.filter(F.col("value").isNotNull()).count()


def test_observed_counts_only_filtered_rows(spark):
    """Metrics measure the rows the PLAN processes — a filter upstream of
    the observe point is reflected, proving there's no hidden full scan."""
    from mapreduce_sm_spark.observability import observed
    from mapreduce_sm_spark.session import table

    ev = table(spark, SF_DIR, "events").filter(F.col("event_type") == "click")
    df, obs = observed(ev, "clicks_only", n=F.count(F.lit(1)))
    df.write.format("noop").mode("overwrite").save()
    assert obs.get["n"] == ev.count()


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    from mapreduce_sm_spark.sources.maintenance import compact_parquet
    from mapreduce_sm_spark.session import table

    # fragment: write orders as many tiny files
    src = str(tmp_path / "fragmented")
    orders = table(spark, SF_DIR, "orders")
    orders.repartition(40).write.parquet(src)
    n_src_files = len(glob.glob(os.path.join(src, "part-*")))
    assert n_src_files >= 40

    dst = str(tmp_path / "compacted")
    n_out = compact_parquet(spark, src, dst, target_file_mb=128)
    n_dst_files = len(glob.glob(os.path.join(dst, "part-*")))
    assert n_out == 1 and n_dst_files == 1  # tiny table -> one 128MB-target file
    # content preserved
    assert spark.read.parquet(dst).count() == orders.count()
