"""Custom Python DataSource for the reference engine's text format.

The reference's only I/O is a custom mmap reader chunked into per-task
line ranges (/root/reference/src/mapreduce.c:190-217 file_reader +
splitter) and a printf-formatted single-file sink
(mapreduce.c:354-357,457-489 output_writer: "%s\t%d" for wordcount,
"%d:%s" for string_match). The batch engine covers those with built-ins
(sources/readers.py, sinks.py::write_formatted_text); THIS module covers
the extension-point parity: Spark 4's Python DataSource API is the
idiomatic way to plug a custom format into the planner, the way the
reference plugs file_reader/output_writer into its job struct
(include/mapreduce.h:114-121).

`refmr` reads the reference's two output formats back as typed tables:

    spark.read.format("refmr").option("fmt", "wordcount").load(dir)
        -> (key string, value bigint)        # "%s\t%d" lines
    ... .option("fmt", "string_match") ...
        -> (line_no bigint, line string)     # "%d:%s" lines

and writes them back out (`df.write.format("refmr")...`), one formatted
text file per task — the distributed generalization of the reference's
single FILE*.

Scale behavior:
  - one InputPartition per file (the planner parallelizes across files,
    like the reference's splitter parallelizes across chunks);
  - filter PUSHDOWN into the source: comparison filters on the int
    column and prefix/containment filters on the string column are
    applied while scanning lines, before rows reach the engine —
    pushFilters returns only the residual set, so Catalyst drops its own
    duplicate Filter node for what the source already guarantees.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    StringContains,
    StringStartsWith,
    WriterCommitMessage,
)

_FORMATS = {
    # fmt -> (schema DDL, (str_col, int_col), parse order: int first?)
    "wordcount": ("key string, value bigint", ("key", "value"), False),
    "string_match": ("line_no bigint, line string", ("line", "line_no"), True),
}

_INT_OPS = {
    EqualTo: lambda v, c: v == c,
    GreaterThan: lambda v, c: v > c,
    GreaterThanOrEqual: lambda v, c: v >= c,
    LessThan: lambda v, c: v < c,
    LessThanOrEqual: lambda v, c: v <= c,
}
_STR_OPS = {
    EqualTo: lambda v, c: v == c,
    StringStartsWith: lambda v, c: v.startswith(c),
    StringContains: lambda v, c: c in v,
}


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class RefMRReader(DataSourceReader):
    def __init__(self, path: str, fmt: str):
        self.path = path
        self.fmt = fmt
        _, (self.str_col, self.int_col), self.int_first = _FORMATS[fmt]
        self.pushed: list[Filter] = []

    def _files(self) -> list[str]:
        if os.path.isfile(self.path):
            return [self.path]
        return sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.startswith("part-") or f.endswith(".txt")
        )

    def partitions(self) -> Sequence[InputPartition]:
        return [_FilePartition(p) for p in self._files()]

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Accept what the line scanner can evaluate exactly; everything
        else stays with Catalyst. Attribute paths are 1-element tuples
        for these flat schemas.

        Reset accumulated state first: Spark 4.1 caches the post-pushdown
        read info on the RELATION, so a reader instance can survive into
        a later planning pass (see read_formatted_text's caveat)."""
        self.pushed = []
        for f in filters:
            col = f.attribute[0] if getattr(f, "attribute", None) else None
            ops = (
                _INT_OPS
                if col == self.int_col
                else _STR_OPS
                if col == self.str_col
                else None
            )
            if ops is not None and type(f) in ops:
                self.pushed.append(f)
            else:
                yield f  # residual: engine re-evaluates

    def _keep(self, sval: str, ival: int) -> bool:
        for f in self.pushed:
            col = f.attribute[0]
            v = ival if col == self.int_col else sval
            op = (_INT_OPS if col == self.int_col else _STR_OPS)[type(f)]
            if not op(v, f.value):
                return False
        return True

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if not line:
                    continue
                if self.int_first:
                    # "%d:%s" — split on the FIRST colon only
                    num, _, rest = line.partition(":")
                    ival, sval = int(num), rest
                    if self._keep(sval, ival):
                        yield (ival, sval)
                else:
                    # "%s\t%d" — split on the LAST tab (keys can't hold
                    # tabs in the reference grammar, but be defensive)
                    head, _, num = line.rpartition("\t")
                    ival, sval = int(num), head
                    if self._keep(sval, ival):
                        yield (sval, ival)


class _Committed(WriterCommitMessage):
    def __init__(self, path: str):
        self.path = path


class RefMRWriter(DataSourceWriter):
    def __init__(self, path: str, fmt: str, overwrite: bool):
        self.path = path
        self.fmt = fmt
        self.overwrite = overwrite
        _, _, self.int_first = _FORMATS[fmt]

    def write(self, rows: Iterator) -> _Committed:
        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(self.path, f"part-{pid:05d}.txt")
        with open(out, "w", encoding="utf-8") as fh:
            for r in rows:
                if self.int_first:
                    fh.write(f"{r[0]}:{r[1]}\n")
                else:
                    fh.write(f"{r[0]}\t{r[1]}\n")
        return _Committed(out)

    def commit(self, messages) -> None:  # noqa: ARG002 — files are final
        pass

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class RefMRDataSource(DataSource):
    """format name: refmr; options: fmt=wordcount|string_match, path."""

    @classmethod
    def name(cls) -> str:
        return "refmr"

    def schema(self) -> str:
        fmt = self.options.get("fmt", "wordcount")
        if fmt not in _FORMATS:
            raise ValueError(f"refmr: unknown fmt {fmt!r}")
        return _FORMATS[fmt][0]

    def reader(self, schema) -> RefMRReader:  # noqa: ARG002
        return RefMRReader(
            self.options["path"], self.options.get("fmt", "wordcount")
        )

    def writer(self, schema, overwrite: bool) -> RefMRWriter:  # noqa: ARG002
        return RefMRWriter(
            self.options["path"],
            self.options.get("fmt", "wordcount"),
            overwrite,
        )


def register(spark) -> None:
    """Register the refmr format (idempotent, cross-session safe)."""
    from mapreduce_sm_spark.session import register_data_source

    register_data_source(spark, RefMRDataSource)


def read_formatted_text(spark, path: str, fmt: str = "wordcount"):
    """Fresh refmr read of a reference-format text directory.

    ALWAYS load per logical query (this helper does): Spark 4.1 computes
    a Python data source's read — including pushed filters — once per
    RELATION and caches it, so two queries sharing one loaded DataFrame
    can leak one query's pushdown into the other's scan (pinned in
    tests/test_refmr_source.py). Built-in file sources don't share this
    caveat; fresh load() per query restores the expected semantics."""
    # RefMRReader implements pushFilters(); Spark 4.1 REFUSES to plan such
    # a reader when this conf is false (DATA_SOURCE_PUSHDOWN_DISABLED)
    # rather than silently skipping pushdown, and the conf defaults to
    # false. It is runtime-settable, so pin it at every read site instead
    # of relying on the builder session (r6 driver ERR: the driver's
    # session lacked the builder-time conf in session.py).
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    register(spark)
    return (
        spark.read.format("refmr")
        .option("fmt", fmt)
        .option("path", path)
        .load()
    )
