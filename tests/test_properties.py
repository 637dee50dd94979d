"""Property-based tests (SURVEY §5.2.3): the text/hash primitives hold
their contracts on arbitrary inputs, not just fixture data."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

# ASCII-ish text including quotes/punctuation; the fixture corpus is ASCII
TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=80
)


def _spark_rows(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


@settings(max_examples=20, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_tokenize_matches_reference_grammar(spark, texts):
    """tokenize_words == the reference scanner's intent: maximal runs of
    [A-Za-z][A-Za-z']* uppercased (wordcount.c:56-92, minus its
    chunk-boundary bugs)."""
    from pyspark.sql import functions as F

    from mapreduce_sm_spark.functions.text import tokenize_words

    got = (
        _spark_rows(spark, texts)
        .select(tokenize_words("text").alias("toks"))
        .collect()
    )
    for row, t in zip(got, texts):
        expected = re.findall(r"[A-Z][A-Z']*", t.upper())
        assert list(row.toks) == expected


@settings(max_examples=20, deadline=None)
@given(st.lists(TEXT.filter(lambda t: len(t) > 0), min_size=1, max_size=8))
def test_char_shingles_cover_string(spark, texts):
    """every k-shingle is a substring; count = max(len-k+1, 1)."""
    from mapreduce_sm_spark.functions.text import char_shingles

    k = 5
    got = (
        _spark_rows(spark, texts)
        .select(char_shingles("text", k).alias("sh"))
        .collect()
    )
    for row, t in zip(got, texts):
        assert len(row.sh) == max(len(t) - k + 1, 1)
        for s in row.sh:
            assert s in t


@settings(max_examples=10, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=6))
def test_hash60_portable_and_in_range(spark, texts):
    """hash60 matches DuckDB bit-for-bit and stays in [0, 2^60)."""
    import duckdb

    from mapreduce_sm_spark.functions.hashing import hash60, hash60_sql

    spark_vals = [
        r.h
        for r in _spark_rows(spark, texts)
        .select(hash60("text").alias("h"))
        .collect()
    ]
    con = duckdb.connect()
    duck_vals = [
        con.execute(
            f"SELECT {hash60_sql('?')}", [t]
        ).fetchone()[0]
        for t in texts
    ]
    assert spark_vals == duck_vals
    assert all(0 <= v < (1 << 60) for v in spark_vals)
