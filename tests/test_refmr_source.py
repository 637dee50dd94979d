"""Custom Python DataSource (refmr): round-trip against the reference's
two text formats, filter pushdown correctness, partition-per-file
parallelism, the write side, and the Spark 4.1 relation-caching caveat
that motivates fresh-load-per-query."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from mapreduce_sm_spark.operators.string_match import string_match
from mapreduce_sm_spark.operators.wordcount import wordcount
from mapreduce_sm_spark.sources.refmr_source import (
    RefMRReader,
    read_formatted_text,
    register,
)
from mapreduce_sm_spark.sources.sinks import write_formatted_text
from tests.conftest import SF_DIR


def test_wordcount_roundtrip(spark, tmp_path):
    wc = wordcount(spark, SF_DIR)
    d = str(tmp_path / "wc")
    write_formatted_text(wc, "%s\t%d", ["word", "cnt"], d)
    back = read_formatted_text(spark, d, fmt="wordcount")
    assert sorted(map(tuple, back.collect())) == sorted(
        (r.word, r.cnt) for r in wc.collect()
    )


def test_string_match_roundtrip_with_colons_in_text(spark, tmp_path):
    sm = string_match(spark, SF_DIR)
    d = str(tmp_path / "sm")
    write_formatted_text(sm, "%d:%s", ["line_no", "line"], d)
    back = read_formatted_text(spark, d, fmt="string_match")
    # "%d:%s" must split on the FIRST colon only — lines may contain ':'
    assert sorted(map(tuple, back.collect())) == sorted(
        (r.line_no, r.line) for r in sm.collect()
    )


def test_filter_pushdown_matches_engine_filtering(spark, tmp_path):
    wc = wordcount(spark, SF_DIR)
    d = str(tmp_path / "wcf")
    write_formatted_text(wc, "%s\t%d", ["word", "cnt"], d)
    pushed = (
        read_formatted_text(spark, d, fmt="wordcount")
        .filter((F.col("value") > 100) & F.col("key").startswith("S"))
        .collect()
    )
    expect = [
        (r.word, r.cnt)
        for r in wc.collect()
        if r.cnt > 100 and r.word.startswith("S")
    ]
    assert sorted(map(tuple, pushed)) == sorted(expect)


def test_pushfilters_residual_contract():
    from pyspark.sql.datasource import EqualTo, GreaterThan, IsNotNull

    r = RefMRReader.__new__(RefMRReader)
    r.str_col, r.int_col, r.pushed = "key", "value", []
    filters = [
        GreaterThan(("value",), 10),   # accepted: int comparison
        EqualTo(("key",), "FOO"),      # accepted: string equality
        IsNotNull(("key",)),           # residual: not supported
    ]
    residual = list(r.pushFilters(filters))
    assert residual == [IsNotNull(("key",))]
    assert len(r.pushed) == 2


def test_partition_per_file_and_writer(spark, tmp_path):
    register(spark)
    src = str(tmp_path / "multi")
    os.makedirs(src)
    for i in range(3):
        with open(f"{src}/part-{i:05d}.txt", "w") as fh:
            for j in range(5):
                fh.write(f"w{i}_{j}\t{i * 10 + j}\n")
    df = read_formatted_text(spark, src, fmt="wordcount")
    assert df.rdd.getNumPartitions() == 3  # one partition per file
    assert df.count() == 15
    # write side: one formatted file per task, read-back identical
    out = str(tmp_path / "out")
    df.write.format("refmr").option("fmt", "wordcount").option(
        "path", out
    ).mode("overwrite").save()
    assert len(glob.glob(f"{out}/part-*.txt")) == 3
    again = read_formatted_text(spark, out, fmt="wordcount")
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_relation_cache_caveat_is_pinned(spark, tmp_path):
    """Document the Spark 4.1 behavior that makes fresh-load-per-query
    mandatory: a filtered child query bakes its pushdown into the shared
    relation, corrupting the parent DataFrame's later scans. If this
    assertion ever FAILS, Spark fixed the caching and the caveat note in
    read_formatted_text can be dropped."""
    wc = wordcount(spark, SF_DIR).limit(20)
    d = str(tmp_path / "caveat")
    write_formatted_text(wc, "%s\t%d", ["word", "cnt"], d)
    shared = read_formatted_text(spark, d, fmt="wordcount")
    n_all = shared.count()
    n_filtered = shared.filter(F.col("value") > 10**9).count()
    assert n_filtered == 0
    leaked = shared.count()  # same relation, post-pushdown
    fresh = read_formatted_text(spark, d, fmt="wordcount").count()
    assert fresh == n_all
    if leaked == n_all:
        # Spark fixed the relation caching — caveat obsolete, loudly
        raise AssertionError(
            "refmr relation-cache caveat no longer reproduces; "
            "update read_formatted_text's docstring"
        )
    assert leaked == n_filtered
