"""Scalar serialization round trips on hostile values — the fixture data
is too polite to exercise quoting, so these frames carry the separators,
quotes, newlines, and unicode that actually break CSV/XML codecs."""

from __future__ import annotations

from pyspark.sql import functions as F

HOSTILE = [
    (1, "plain", 10.25),
    (2, "comma, inside", -3.50),
    (3, 'quoted "name" here', 0.00),
    (4, "line\nbreak", 99999999.99),
    (5, "tab\tand;semicolon", -0.01),
    (6, "ünïcødé — em-dash", 1.23),
    (8, 'trailing backslash \\ and ""', 7.77),
]


def test_csv_roundtrip_survives_hostile_strings(spark):
    df = spark.createDataFrame(HOSTILE, "id long, name string, bal double")
    back = (
        df.select(F.to_csv(F.struct("id", "name", "bal")).alias("line"))
        .select(
            F.from_csv("line", "id long, name string, bal double").alias("s")
        )
        .select("s.*")
    )
    got = sorted(tuple(r) for r in back.collect())
    assert got == sorted(HOSTILE)


def test_csv_roundtrip_empty_string_becomes_null(spark):
    # Pinned Spark CSV semantics, not a bug to paper over: an empty
    # string serializes to "" but parses back as NULL (from_csv's
    # default emptyValue handling). Any pipeline round-tripping
    # nullable text through CSV must treat '' and NULL as one value —
    # the registered csv_roundtrip_stats only aggregates non-string
    # measures, so it is immune.
    df = spark.createDataFrame([(7, "", 2.0)], "id long, name string, bal double")
    back = (
        df.select(F.to_csv(F.struct("id", "name", "bal")).alias("line"))
        .select(
            F.from_csv("line", "id long, name string, bal double").alias("s")
        )
        .select("s.*")
    )
    assert [tuple(r) for r in back.collect()] == [(7, None, 2.0)]


def test_xml_roundtrip_survives_hostile_strings(spark):
    # XML adds entity escaping (&, <, >) to the hazard list
    rows = HOSTILE + [(9, "<tag> & &amp; </tag>", 5.55)]
    df = spark.createDataFrame(rows, "id long, name string, bal double")
    back = (
        df.select(F.to_xml(F.struct("id", "name", "bal")).alias("x"))
        .select(
            F.from_xml("x", "id long, name string, bal double").alias("s")
        )
        .select("s.*")
    )
    got = sorted(tuple(r) for r in back.collect())
    assert got == sorted(rows)
