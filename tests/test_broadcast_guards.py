"""Eval-suite broadcast-row capacity guards (VERDICT r15 item 2).

The streamed/semantic decontamination probes collapse the entire
distinct eval gram / eval embedding set into ONE broadcast row. That
shape assumes a corpus-size-CONSTANT eval suite; these tests pin the
contract that an eval set crossing the documented bound dies with a
NAMED error naming the fallback path — never as an opaque executor
OOM (the bloom-geometry guard pattern, functions/bloom.py).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_sm_spark.functions.guards import bounded_broadcast_array


def _one_row_array(spark, n: int):
    return spark.range(1).select(
        F.sequence(F.lit(1), F.lit(n)).cast("array<bigint>").alias("a")
    )


def test_guard_passes_at_and_under_bound(spark):
    got = (
        _one_row_array(spark, 3)
        .select(
            bounded_broadcast_array(
                F.col("a"), 3, op="t", fallback="f", typ="array<bigint>"
            ).alias("a")
        )
        .collect()[0]["a"]
    )
    assert got == [1, 2, 3]


def test_guard_raises_named_error_past_bound(spark):
    df = _one_row_array(spark, 4).select(
        bounded_broadcast_array(
            F.col("a"),
            3,
            op="some_op",
            fallback="the named fallback path",
            typ="array<bigint>",
        ).alias("a")
    )
    with pytest.raises(Exception, match="some_op.*documented bound"):
        df.collect()
    with pytest.raises(Exception, match="the named fallback path"):
        df.collect()


def test_guard_passes_on_empty_and_null_array(spark):
    # empty eval corpus must stay a clean no-op probe, not a guard trip
    df = spark.range(1).select(
        F.expr("CAST(array() AS ARRAY<BIGINT>)").alias("e"),
        F.lit(None).cast("array<bigint>").alias("n"),
    )
    row = df.select(
        bounded_broadcast_array(
            F.col("e"), 2, op="t", fallback="f", typ="array<bigint>"
        ).alias("e"),
        bounded_broadcast_array(
            F.col("n"), 2, op="t", fallback="f", typ="array<bigint>"
        ).alias("n"),
    ).collect()[0]
    assert row["e"] == [] and row["n"] is None


def test_eval_gram_row_guard_fires_past_bound(spark, monkeypatch):
    """stream_decontamination_equality's eval gram row: 3 distinct grams
    against a monkeypatched bound of 2 must raise the gram-exchange
    fallback by name."""
    from mapreduce_sm_spark.operators import dedup

    monkeypatch.setattr(dedup, "_EVAL_GRAM_BROADCAST_BOUND", 2)
    docs = spark.createDataFrame(
        [(0, "x"), (7, "train doc ignored")], "doc_id long, text string"
    )
    grams = lambda c: F.array(  # noqa: E731
        F.lit(3).cast("long"), F.lit(1).cast("long"), F.lit(2).cast("long")
    )
    with pytest.raises(Exception, match="gram-exchange semi-join path"):
        dedup._eval_gram_static(docs, grams).collect()
    # at the (patched) bound it passes, sorted
    monkeypatch.setattr(dedup, "_EVAL_GRAM_BROADCAST_BOUND", 3)
    got = dedup._eval_gram_static(docs, grams).collect()[0]["ev_grams"]
    assert got == [1, 2, 3]


def test_semantic_decon_guard_fires_end_to_end(spark, monkeypatch):
    """semantic_decontamination_split against the fixtures with a
    bound of 1: the real collapsed eval row (50 eval vectors at
    sf0.001) must trip the guard and name the cell-blocked fallback."""
    from mapreduce_sm_spark.operators import similarity

    from tests.conftest import SF_DIR

    monkeypatch.setattr(similarity, "_EVAL_VEC_BROADCAST_BOUND", 1)
    with pytest.raises(Exception, match="cell-blocked semantic index"):
        similarity.semantic_decontamination_split(spark, SF_DIR).collect()
