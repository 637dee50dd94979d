"""Custom streaming DataSource (eventgen): offset-managed exactly-once
delivery, source-side backpressure, per-batch parallel read, and offset
resume across a checkpointed restart."""

from __future__ import annotations

import time

from pyspark.errors import AnalysisException

from mapreduce_sm_spark.sources.eventgen_stream import gen_event, register


def _sink_count(spark, out) -> int:
    try:
        return spark.read.parquet(out).count()
    except AnalysisException:
        return 0  # sink dir has only _spark_metadata so far


def _run_until(spark, out, ckpt, max_rows, rows_per_batch=100, timeout=90):
    register(spark)
    stream = (
        spark.readStream.format("eventgen")
        .option("rowsPerBatch", rows_per_batch)
        .option("maxRows", max_rows)
        .option("numPartitions", 4)
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + timeout
    try:
        while time.time() < deadline:
            if _sink_count(spark, out) >= max_rows:
                break
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination(30)
    return spark.read.parquet(out)


def test_exactly_once_bounded_generation(spark, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    df = _run_until(spark, out, ckpt, max_rows=300)
    rows = {r.event_id: r for r in df.collect()}
    # every offset delivered exactly once, nothing past the cap
    assert sorted(rows) == list(range(300))
    # content is a pure function of the offset (the source's replay-log-
    # free restart guarantee) — spot-check against the shared generator
    for i in (0, 7, 299):
        e = gen_event(i)
        r = rows[i]
        assert (r.event_id, r.ts_us, r.user_id, r.event_type, r.value) == e[:5]


def test_backpressure_bounds_every_batch(spark, tmp_path):
    register(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = (
        spark.readStream.format("eventgen")
        .option("rowsPerBatch", 50)
        .option("maxRows", 200)
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 90
    try:
        while time.time() < deadline:
            if _sink_count(spark, out) >= 200:
                break
            time.sleep(0.5)
        sizes = [
            p["numInputRows"]
            for p in q.recentProgress
            if p["numInputRows"] > 0
        ]
    finally:
        q.stop()
        q.awaitTermination(30)
    assert sizes and all(s <= 50 for s in sizes), sizes
    assert sum(sizes) == 200


def test_restart_resumes_from_committed_offset(spark, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    first = _run_until(spark, out, ckpt, max_rows=300)
    assert first.count() == 300
    # restart with a higher cap and the SAME checkpoint: the reader's
    # initial high-water mark must come from the committed offset, so
    # rows 0..299 are never re-emitted and 300..599 all arrive
    again = _run_until(spark, out, ckpt, max_rows=600)
    ids = [r.event_id for r in again.collect()]
    assert sorted(ids) == list(range(600))
    assert len(ids) == len(set(ids)), "duplicate delivery across restart"


def test_register_is_session_scoped(spark):
    register(spark)  # idempotent double-registration must not raise


def test_eventgen_feeds_stateful_session_windows(spark, tmp_path):
    """Integration: the custom streaming source drives the stateful
    session_window operator end-to-end. The generator emits one event
    per synthetic second per offset, users cycle i % 50, so each user's
    events are 50 s apart — far under the 30-min gap — and every user
    ends with exactly ONE open session holding max_rows/50 events
    (complete mode surfaces open sessions)."""
    from mapreduce_sm_spark.streaming.windows import streaming_session_micros
    from pyspark.sql import functions as F

    register(spark)
    max_rows = 500
    stream = (
        spark.readStream.format("eventgen")
        .option("rowsPerBatch", 500)
        .option("maxRows", max_rows)
        .load()
        .select(
            "event_id",
            F.timestamp_micros("ts_us").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
    )
    q = (
        streaming_session_micros(stream)
        .writeStream.format("memory")
        .queryName("eventgen_sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("eventgen_sessions").collect()
    assert len(rows) == 50  # one session per user
    assert all(r.n_events == max_rows // 50 for r in rows)
    # session span: first event i=u, last i=u+450 -> 450 s + 30 min gap
    for r in rows:
        assert r.session_end_us - r.session_start_us == (
            (max_rows - 50) * 1_000_000 + 30 * 60 * 1_000_000
        )
