"""Streaming bottom-k rank sketch via applyInPandasWithState over the
RocksDB state store — the THIRD proven member of the streaming-
mergeability trilogy (extension; the reference has no streaming —
SURVEY §2.B).

Count-Min proved "counts add" (sketch_stream.py); the bitmap proved
"bitmaps OR" (bitmap_stream.py); this proves "bottom-k is a
min-structure": keeping the k smallest (h, key) rows is associative,
commutative, and idempotent over any partition of the input — merging
per-batch bottom-k's and truncating to k reaches the same synopsis as
one batch pass, so streamed == batch is a theorem and the contract
query (operators/sketches.py::stream_quantile_equality) measures the
machinery: array-valued state round-trips through RocksDB, update-mode
emission, final-state extraction. This closes the loop on the batch
quantile synopsis (quantile_sketch_order_price): the sketch a stream
maintains incrementally is BIT-IDENTICAL to the one a batch job builds,
which is what lets a 100 TB pipeline serve quantiles from a
continuously-maintained k-row table.

Scale posture: state is <= k rows of three int64s no matter how many
rows stream through (geometry-bounded, like CM's d*w cells and the
bitmap's 4096 bytes). The fold is a single global group here — honest
fixture shape; a production stream would pre-reduce per-shard bottom-k
partials (the merge law makes that sound) before the global truncate.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

BOTTOMK_STATE_SCHEMA = StructType(
    [
        StructField("hs", ArrayType(LongType())),
        StructField("ks", ArrayType(LongType())),
        StructField("cs", ArrayType(LongType())),
        StructField("batch_seq", LongType()),
    ]
)

BOTTOMK_OUTPUT_SCHEMA = StructType(
    [
        StructField("grp", LongType()),
        StructField("batch_seq", LongType()),
        StructField("n_kept", LongType()),
        StructField("tau_h", LongType()),
        StructField("sum_cents", LongType()),
        StructField("sketch_md5", StringType()),
    ]
)


def sketch_md5_py(rows) -> str:
    """Canonical content hash of a bottom-k synopsis: md5 over the
    comma-joined 'h:key:cents' triples in (h, key) ascending order —
    computable identically by this fold and by pure Spark SQL on the
    batch sketch (sort_array over structs, array_join, md5)."""
    return hashlib.md5(
        ",".join(f"{int(h)}:{int(k)}:{int(c)}" for h, k, c in rows).encode()
    ).hexdigest()


def make_bottomk_fold(k: int):
    """State transition for the single sketch group: merge this batch's
    (h, key, cents) rows into the kept set, truncate to the k smallest
    by (h, key). Dedup by full triple first — min-structures are
    idempotent, so a replayed row cannot perturb the synopsis."""

    def _fold(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            hs, ks, cs, seq = state.get
            rows = set(zip(hs, ks, cs))
        else:
            rows, seq = set(), 0
        for pdf in pdfs:
            rows.update(
                zip(
                    (int(x) for x in pdf["h"]),
                    (int(x) for x in pdf["key"]),
                    (int(x) for x in pdf["cents"]),
                )
            )
        kept = sorted(rows)[:k]
        seq += 1
        state.update(
            (
                [r[0] for r in kept],
                [r[1] for r in kept],
                [r[2] for r in kept],
                seq,
            )
        )
        yield pd.DataFrame(
            {
                "grp": [int(key[0])],
                "batch_seq": [seq],
                "n_kept": [len(kept)],
                "tau_h": [kept[-1][0] if kept else None],
                "sum_cents": [sum(r[2] for r in kept)],
                "sketch_md5": [sketch_md5_py(kept)],
            }
        )

    return _fold


def orders_price_stream(
    spark: SparkSession,
    sf_dir: str,
    glob: str = "orders.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming source over the orders fixture (key + price only);
    schema from a one-off batch footer read (no frozen schema)."""
    from pyspark.errors.exceptions.captured import AnalysisException

    try:
        schema = (
            spark.read.option("pathGlobFilter", glob)
            .parquet(sf_dir)
            .select("o_orderkey", "o_totalprice")
            .schema
        )
    except AnalysisException as e:
        cond = e.getCondition() or ""
        if cond not in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"):
            raise
        schema = "o_orderkey long, o_totalprice double"
    reader = spark.readStream.schema(schema).option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(sf_dir)


def run_stream_bottomk(
    spark: SparkSession,
    sf_dir: str,
    k: int,
    salt: str,
    query_name: str,
    glob: str = "orders.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Maintain the bottom-k rank sketch by STREAMING the orders fixture;
    returns the final 1-row (n_kept, tau_h, sum_cents, sketch_md5)
    digest. The stream-side (h, key, cents) derivation mirrors
    operators/sketches.py::_qsk_bottom_k expression-for-expression."""
    from mapreduce_sm_spark.functions.hashing import hash60

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    stream = orders_price_stream(spark, sf_dir, glob, max_files_per_trigger)
    hkey = F.concat(F.lit(salt + "|"), F.col("o_orderkey").cast("string"))
    rows = stream.select(
        F.lit(1).cast("long").alias("grp"),
        hash60(hkey).alias("h"),
        F.col("o_orderkey").cast("long").alias("key"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    out = rows.groupBy("grp").applyInPandasWithState(
        make_bottomk_fold(k),
        outputStructType=BOTTOMK_OUTPUT_SCHEMA,
        stateStructType=BOTTOMK_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    from mapreduce_sm_spark.streaming.windows import _await_or_raise

    _await_or_raise(q, query_name, 180)
    sink = spark.table(query_name)
    # update mode: one digest row per touching batch; batch_seq counts
    # folds, so the final state is unambiguously the max-seq row.
    last = sink.agg(F.max("batch_seq").alias("batch_seq"))
    return sink.join(F.broadcast(last), "batch_seq").select(
        "n_kept", "tau_h", "sum_cents", "sketch_md5"
    )


__all__ = [
    "BOTTOMK_OUTPUT_SCHEMA",
    "BOTTOMK_STATE_SCHEMA",
    "make_bottomk_fold",
    "orders_price_stream",
    "run_stream_bottomk",
    "sketch_md5_py",
]
