"""tf_cosine_pairs_prefix must EQUAL tf_cosine_pairs row-for-row.

The prefix filter (L2AP suffix-norm bound, see the module comment in
operators/text_analysis.py) is lossless at exactly cos^2 >= 0.81, so the
sub-quadratic rung and the exact inverted-index baseline must produce
identical (doc_a, doc_b, cos2_ppm) sets — value-for-value, not just the
same count. The shared DuckDB oracle checks each independently; this
test checks them against each other directly, which is the stronger
claim VERDICT r07 item 6 asks for."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_prefix_rung_equals_exact_baseline(spark):
    from mapreduce_sm_spark.operators.text_analysis import (
        tf_cosine_pairs,
        tf_cosine_pairs_prefix,
    )

    exact = sorted(tuple(r) for r in tf_cosine_pairs(spark, SF_DIR).collect())
    prefix = sorted(
        tuple(r) for r in tf_cosine_pairs_prefix(spark, SF_DIR).collect()
    )
    assert len(exact) > 0  # fixtures contain qualifying near-dup pairs
    assert prefix == exact


def test_prefix_filter_actually_prunes(spark):
    """The prefix index must be materially smaller than the full df>=2
    inverted index — otherwise the rung adds machinery without the
    sub-quadratic payoff it exists for."""
    from pyspark.sql import functions as F

    from mapreduce_sm_spark.session import table

    toks = table(spark, SF_DIR, "documents").select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), F.lit(0))
        ).alias("term"),
    )
    cnt = toks.groupBy("doc_id", "term").agg(F.count("*").alias("c"))
    full_index_rows = (
        cnt.join(
            cnt.groupBy("term").agg(F.count("*").alias("df")).filter("df >= 2"),
            "term",
        ).count()
    )

    # independently re-derive the membership rule (ss*100 >= n2*81) and
    # count surviving index rows
    from pyspark.sql import Window

    n2 = cnt.groupBy("doc_id").agg(F.sum(F.col("c") * F.col("c")).alias("n2"))
    shared = cnt.join(
        cnt.groupBy("term").agg(F.count("*").alias("df")).filter("df >= 2"),
        "term",
    )
    ordered = (
        shared.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("df", "term", "c"))).alias("st"))
        .select("doc_id", F.posexplode("st").alias("p0", "e"))
        .select(
            "doc_id",
            (F.col("p0") + 1).alias("p"),
            F.col("e.c").alias("c"),
        )
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy(F.col("p").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefix_rows = (
        ordered.withColumn("ss", F.sum((F.col("c") * F.col("c")).cast("long")).over(w))
        .join(n2, "doc_id")
        .filter(F.col("ss") * 100 >= F.col("n2") * 81)
        .count()
    )
    assert prefix_rows < full_index_rows * 0.5, (
        f"prefix index {prefix_rows} rows vs full index {full_index_rows}"
    )
