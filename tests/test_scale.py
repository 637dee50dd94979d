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


def test_approx_percentiles_bounded_error(spark):
    """The sketch's p50/p90/p99 must sit within 2% relative error of the
    exact percentiles (accuracy=10000 -> eps = 1/10000, so 2% is loose
    enough to be stable yet tight enough to catch a broken sketch)."""
    from pyspark.sql import functions as F

    from mapreduce_sm_spark.operators.relational import (
        approx_percentiles_lineitem,
    )
    from mapreduce_sm_spark.session import table

    got = {
        r.l_returnflag: (r.p50, r.p90, r.p99)
        for r in approx_percentiles_lineitem(spark, SF_BIG).collect()
    }
    exact = {
        r.l_returnflag: (r.p50, r.p90, r.p99)
        for r in table(spark, SF_BIG, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
            F.expr("percentile(l_extendedprice, 0.99)").alias("p99"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for flag in got:
        for a, e in zip(got[flag], exact[flag]):
            assert abs(a - e) / e < 0.02, (flag, a, e)
