"""Golden-semantics tests for the two reference flagship jobs
(SURVEY §5.2.1): wordcount and string_match vs the DuckDB oracle."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_wordcount_matches_oracle(spark, duck):
    from mapreduce_sm_spark.operators.wordcount import wordcount

    got = {(r.word, r.cnt) for r in wordcount(spark, SF_DIR).collect()}
    want = set(
        duck.execute(
            "SELECT word, count(*) FROM (SELECT unnest(regexp_extract_all("
            "upper(text), '[A-Z][A-Z'']*')) AS word FROM documents) GROUP BY word"
        ).fetchall()
    )
    assert got == want
    assert len(got) > 0


def test_wordcount_token_grammar(spark):
    """Token grammar fidelity (SURVEY §7.3): [A-Za-z][A-Za-z']* uppercased,
    apostrophes inside words kept, digits/punct excluded."""
    import pandas as pd

    from mapreduce_sm_spark.functions.text import tokenize_words

    df = spark.createDataFrame(
        pd.DataFrame({"text": ["Don't stop 123 the-quick o'clock X"]})
    )
    [row] = df.select(tokenize_words("text").alias("t")).collect()
    assert row.t == ["DON'T", "STOP", "THE", "QUICK", "O'CLOCK", "X"]


def test_wordcount_ordering(spark):
    from mapreduce_sm_spark.operators.wordcount import wordcount

    rows = wordcount(spark, SF_DIR).collect()
    counts = [r.cnt for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_string_match_matches_oracle(spark, duck):
    from mapreduce_sm_spark.operators.string_match import string_match

    rows = string_match(spark, SF_DIR).collect()
    want = duck.execute(
        "SELECT doc_id, text FROM documents WHERE contains(lower(text), 'data') "
        "ORDER BY doc_id"
    ).fetchall()
    assert [(r.line_no, r.line) for r in rows] == want
    # ascending line numbers (reference sort: key_int ASC)
    line_nos = [r.line_no for r in rows]
    assert line_nos == sorted(line_nos)


def test_pipeline_api_equivalence(spark):
    """The five-slot Pipeline API reproduces the direct plan's results."""
    from mapreduce_sm_spark.operators.wordcount import wordcount, wordcount_pipeline

    direct = {(r.word, r.cnt) for r in wordcount(spark, SF_DIR).collect()}
    piped = {(r.word, r.cnt) for r in wordcount_pipeline(spark, SF_DIR).collect()}
    assert direct == piped


def test_pipeline_formatted_sink(spark, tmp_path):
    """write_formatted ≡ the reference's output_writer ("%s\\t%d")."""
    from pyspark.sql import functions as F

    from mapreduce_sm_spark.plans import Pipeline, SortSpec
    from mapreduce_sm_spark.functions.text import tokenize_words
    from mapreduce_sm_spark.session import table

    out = str(tmp_path / "wc_out")
    (
        Pipeline(lambda: table(spark, SF_DIR, "documents").select("text"))
        .map(lambda df: df.select(F.explode(tokenize_words("text")).alias("word")))
        .reduce(["word"], [F.count("*").alias("cnt")])
        .sort(SortSpec("cnt", ascending=False), SortSpec("word"))
        .write_formatted("%s\t%d", ["word", "cnt"], out, single_file=True)
    )
    lines = spark.read.text(out).collect()
    assert len(lines) > 0
    first = lines[0].value
    word, cnt = first.split("\t")
    assert cnt.isdigit() and word == word.upper()
