"""Custom streaming DataSource: a deterministic, offset-managed event
generator (`eventgen`).

The batch twin of this extension point is sources/refmr_source.py (the
reference's file_reader/output_writer parity). Streams have no reference
analog — the reference is batch-only — but §2.B mandates the streaming
surface, and THIS is the part Spark's file source cannot demonstrate:
a source that owns its own offsets. The contract under test:

  - `latestOffset` advances the high-water mark one bounded batch at a
    time (rowsPerBatch), capped at maxRows — backpressure lives in the
    source, not the sink;
  - `partitions(start, end)` splits each micro-batch's offset range into
    numPartitions InputPartitions, so a single batch reads in parallel
    across executors (the streaming analogue of partition-per-file);
  - `read` regenerates rows purely from offsets — restart-safe without
    any replay log, because content is a function of the offset alone
    (event i is fully determined by i);
  - checkpoint restart resumes from the committed offset: re-running
    with a larger maxRows continues at row N, never re-emitting or
    skipping (tests/test_eventgen_stream.py pins exactly-once).

Rows follow the canonical events schema so every downstream streaming
operator (windows, dedup, session state) can consume the generator in
tests without fixture files.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_BASE_US = 1_700_000_000_000_000  # deterministic epoch anchor
_STEP_US = 1_000_000  # one event per synthetic second
_TYPES = ("click", "view", "purchase", "error", "signup")


def gen_event(i: int) -> tuple:
    """Event i, fully determined by i (shared with tests as the oracle)."""
    return (
        i,
        _BASE_US + i * _STEP_US,
        i % 50,
        _TYPES[i % len(_TYPES)],
        (i * 7919 % 100_000) / 100.0,
        None,
    )


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class EventGenStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsperbatch", 100))
        self.max_rows = int(options.get("maxrows", 1000))
        self.n_parts = max(1, int(options.get("numpartitions", 4)))
        self._latest = 0

    def initialOffset(self) -> dict:
        return {"i": 0}

    def latestOffset(self) -> dict:
        self._latest = min(self._latest + self.rows_per_batch, self.max_rows)
        return {"i": self._latest}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        s, e = int(start["i"]), int(end["i"])
        # the restarted reader's high-water mark begins at the committed
        # offset, not 0 — without this, latestOffset could go BACKWARD
        # after a checkpoint restore and the engine would abort
        self._latest = max(self._latest, e)
        if e <= s:
            return [_Range(s, s)]
        step = -(-(e - s) // self.n_parts)
        return [_Range(a, min(a + step, e)) for a in range(s, e, step)]

    def read(self, partition: _Range) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield gen_event(i)

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass


class EventGenDataSource(DataSource):
    """format name: eventgen; options: rowsPerBatch, maxRows,
    numPartitions (option keys reach the source lower-cased)."""

    @classmethod
    def name(cls) -> str:
        return "eventgen"

    def schema(self) -> str:
        return (
            "event_id long, ts_us long, user_id long, "
            "event_type string, value double, props string"
        )

    def streamReader(self, schema) -> EventGenStreamReader:  # noqa: ARG002
        return EventGenStreamReader(self.options)


def register(spark) -> None:
    from mapreduce_sm_spark.session import register_data_source

    register_data_source(spark, EventGenDataSource)
