"""Exactly-once contract of the jsonlog streaming sink, tested at the
protocol level (no Spark needed for the writer itself): marker-gated
publishing, replay idempotency, and abort cleanup."""

from __future__ import annotations

import json
import os

from pyspark.sql import Row

from mapreduce_sm_spark.sources.jsonlog_sink import (
    JsonLogStreamWriter,
    committed_files,
)


def _write_batch(writer, rows):
    return writer.write(iter([Row(**r) for r in rows]))


def test_commit_publishes_marker_last_and_files(tmp_path):
    d = str(tmp_path / "log")
    w = JsonLogStreamWriter(d)
    m1 = _write_batch(w, [{"a": 1}, {"a": 2}])
    m2 = _write_batch(w, [{"a": 3}])
    # temps exist but nothing is committed yet
    assert committed_files(d) == []
    w.commit([m1, m2], 0)
    files = committed_files(d)
    assert len(files) == 2
    rows = []
    for f in files:
        rows += [json.loads(line) for line in open(f)]
    assert sorted(r["a"] for r in rows) == [1, 2, 3]
    assert os.path.exists(os.path.join(d, "_COMMITTED-0"))


def test_replayed_batch_is_idempotent(tmp_path):
    d = str(tmp_path / "log")
    w = JsonLogStreamWriter(d)
    w.commit([_write_batch(w, [{"a": 1}])], 7)
    before = committed_files(d)
    # crash-replay: same batchId arrives again with fresh temps
    w.commit([_write_batch(w, [{"a": 1}])], 7)
    after = committed_files(d)
    assert after == before  # no second publication
    # and the replayed temp was cleaned up, not leaked
    leftovers = [f for f in os.listdir(d) if f.startswith(".tmp-")]
    assert leftovers == []


def test_abort_removes_temps_and_publishes_nothing(tmp_path):
    d = str(tmp_path / "log")
    w = JsonLogStreamWriter(d)
    m = _write_batch(w, [{"a": 1}])
    w.abort([m], 3)
    assert committed_files(d) == []
    assert [f for f in os.listdir(d) if f.startswith(".tmp-")] == []


def test_uncommitted_batch_invisible_to_readers(tmp_path):
    d = str(tmp_path / "log")
    w = JsonLogStreamWriter(d)
    w.commit([_write_batch(w, [{"a": 1}])], 0)
    _write_batch(w, [{"a": 99}])  # batch 1 crashed before commit
    files = committed_files(d)
    rows = [json.loads(line) for f in files for line in open(f)]
    assert [r["a"] for r in rows] == [1]


def test_crashed_partial_publish_then_replay_with_fewer_tasks(tmp_path):
    # attempt 1 renamed its files but died BEFORE the marker; the replay
    # runs with fewer tasks — the stale unpublished files must not ride
    # along under the replay's marker (the review-caught duplication)
    d = str(tmp_path / "log")
    w = JsonLogStreamWriter(d)
    m1 = _write_batch(w, [{"a": 1}])
    m2 = _write_batch(w, [{"a": 2}])
    os.replace(m1.path, os.path.join(d, "batch-5-0.jsonl"))
    os.replace(m2.path, os.path.join(d, "batch-5-1.jsonl"))
    # replay: one task carries both rows
    w.commit([_write_batch(w, [{"a": 1}, {"a": 2}])], 5)
    rows = [
        json.loads(line)
        for f in committed_files(d)
        for line in open(f)
    ]
    assert sorted(r["a"] for r in rows) == [1, 2]
