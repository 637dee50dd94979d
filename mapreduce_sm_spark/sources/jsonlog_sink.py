"""Custom Python DataSource STREAMING SINK (Spark 4 DataSourceStreamWriter)
— completes the engine's custom-connector matrix: batch read/write
(refmr_source.py), stream read (eventgen_stream.py), and now stream
write. Reference anchor: the C runtime's single formatted output file
(/root/reference/src/mapreduce.c:457-489) generalized to an append-only,
exactly-once commit log.

Exactly-once protocol (the part a real sink must get right):
  - each task's write() streams its rows to a TEMP file (uuid name) and
    returns the path in its commit message — data never rides through
    the driver;
  - commit(messages, batchId) renames the temps to deterministic
    `batch-<id>-<k>.jsonl` names and then atomically writes the
    `_COMMITTED-<id>` marker LAST. Readers only trust files whose
    batch marker exists, so a crash between renames publishes nothing;
  - a REPLAYED batch (restart after a crash before the checkpoint
    advanced) sees its marker already present, discards the new temps,
    and commits nothing — idempotent, no duplicates;
  - abort(messages, batchId) deletes the temps.

Scale posture: per-task streaming file writes, driver handles only
renames of per-task paths (O(tasks), not O(rows)); the marker-gated
read side is how every file-based exactly-once sink works (same shape
as Spark's own _spark_metadata commit log).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    WriterCommitMessage,
)


class _TempFile(WriterCommitMessage):
    def __init__(self, path: str, rows: int) -> None:
        self.path = path
        self.rows = rows


class JsonLogStreamWriter(DataSourceStreamWriter):
    def __init__(self, path: str) -> None:
        self.path = path

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), sort_keys=True, default=str))
                fh.write("\n")
                n += 1
        return _TempFile(tmp, n)

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.path, f"_COMMITTED-{batch_id}")

    def commit(self, messages, batchId) -> None:
        marker = self._marker(batchId)
        if os.path.exists(marker):
            # replayed batch: the previous attempt already published —
            # discard the new temps, publish nothing (exactly-once)
            for m in messages:
                if m is not None and os.path.exists(m.path):
                    os.remove(m.path)
            return
        # a previous attempt may have crashed AFTER some renames but
        # BEFORE the marker: those batch-<id>-* files are unpublished
        # (marker absent) and must be removed, or a replay with fewer
        # tasks would publish them alongside its own files (duplicates).
        # Fast path first — stale files can only exist on a replay after
        # a partial publish, and task 0's file always exists in that
        # case, so the common first-attempt commit pays one stat, not a
        # full directory listing per batch (O(batches^2) overall)
        prefix = f"batch-{batchId}-"
        if os.path.exists(os.path.join(self.path, prefix + "0.jsonl")):
            for stale in os.listdir(self.path):
                if stale.startswith(prefix):
                    os.remove(os.path.join(self.path, stale))
        total = 0
        for k, m in enumerate(m for m in messages if m is not None):
            final = os.path.join(self.path, f"batch-{batchId}-{k}.jsonl")
            os.replace(m.path, final)
            total += m.rows
        # marker LAST: readers only trust marker-gated batches. The temp
        # marker uses the same `.tmp-` prefix as data temps so one
        # janitor pattern covers every crash-leftover class
        tmp_marker = os.path.join(
            self.path, f".tmp-marker-{batchId}-{uuid.uuid4().hex}"
        )
        with open(tmp_marker, "w", encoding="utf-8") as fh:
            fh.write(json.dumps({"batch": int(batchId), "rows": total}))
        os.replace(tmp_marker, marker)

    def abort(self, messages, batchId) -> None:  # noqa: ARG002
        # Known caveat: a task that dies before returning its commit
        # message leaves an orphan temp neither commit() nor abort()
        # knows about. Orphans are never published (marker-gated reads)
        # so correctness holds; a production janitor would sweep
        # .tmp-* files older than the newest marker.
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class JsonLogDataSource(DataSource):
    """`df.writeStream.format("jsonlog").option("path", dir)`."""

    @classmethod
    def name(cls) -> str:
        return "jsonlog"

    def streamWriter(self, schema, overwrite) -> JsonLogStreamWriter:  # noqa: ARG002
        return JsonLogStreamWriter(self.options["path"])


def committed_files(path: str) -> list[str]:
    """The marker-gated read side: only files of committed batches.

    Single directory listing, grouped by parsed batch id — not one
    re-list per marker. A missing directory means no batch was ever
    committed (an empty source never triggers write()): no files."""
    if not os.path.isdir(path):
        return []
    names = os.listdir(path)
    committed = {
        n.split("-", 1)[1] for n in names if n.startswith("_COMMITTED-")
    }
    out = [
        os.path.join(path, n)
        for n in names
        if n.startswith("batch-") and n.split("-")[1] in committed
    ]
    return sorted(out)
