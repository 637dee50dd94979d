"""Scale smoke (SURVEY §5.2.4): the same query at sf0.001 and sf0.01 must
produce consistently-scaled aggregates — catches accidental driver-side
truncation (collect/limit) and partition-dependent results."""

from pyspark.sql import functions as F

SF_SMALL = "/root/testdata/sf0.001"
SF_BIG = "/root/testdata/sf0.01"


def test_wordcount_scales_linearly(spark):
    # documents is 500 rows at sf0.001 AND sf0.01 (TESTDATA.md); it only
    # scales 10x at sf0.1 — so compare sf0.01 -> sf0.1
    from mapreduce_sm_spark.operators.wordcount import wordcount

    small = wordcount(spark, SF_BIG).agg(F.sum("cnt")).collect()[0][0]
    big = wordcount(spark, "/root/testdata/sf0.1").agg(F.sum("cnt")).collect()[0][0]
    assert 8 <= big / small <= 12  # fixtures scale 10x


def test_q1_row_volume_scales(spark):
    from mapreduce_sm_spark.operators.relational import q1_pricing_summary

    small = q1_pricing_summary(spark, SF_SMALL).agg(
        F.sum("count_order")
    ).collect()[0][0]
    big = q1_pricing_summary(spark, SF_BIG).agg(
        F.sum("count_order")
    ).collect()[0][0]
    assert 8 <= big / small <= 12


def test_group_cardinality_consistent(spark):
    # grouping keys are a fixed domain: same groups at every scale
    from mapreduce_sm_spark.operators.relational import q1_pricing_summary

    small = {
        (r.l_returnflag, r.l_linestatus)
        for r in q1_pricing_summary(spark, SF_SMALL).collect()
    }
    big = {
        (r.l_returnflag, r.l_linestatus)
        for r in q1_pricing_summary(spark, SF_BIG).collect()
    }
    assert small == big


def test_approx_percentiles_error_contract(spark):
    """The query self-verifies the GK sketch: each emitted *_ok boolean is
    the exact-rank check |rank(sketch_answer) - q*n| <= n/accuracy + 1.
    All must hold at the bigger fixture (a broken sketch or accuracy knob
    flips one)."""
    from mapreduce_sm_spark.operators.relational import (
        approx_percentiles_lineitem,
    )

    rows = approx_percentiles_lineitem(spark, SF_BIG).collect()
    assert rows, "no groups"
    for r in rows:
        assert r.p50_ok and r.p90_ok and r.p99_ok, r
