"""Explicit Bloom filter (functions/bloom.py) + the registered
bloom_semi_prune_orders contract.

The no-false-negative property is a theorem; the tests additionally force
the FALSE-POSITIVE path with a deliberately saturated geometry so the
contract's FP accounting is known non-vacuous, and check the OR-merge law
bit-for-bit against a filter built over the unioned key set.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _hits(spark, bloom_df, lo, hi, m_bits=None):
    from mapreduce_sm_spark.functions.bloom import bloom_might_contain

    kw = {} if m_bits is None else {"m_bits": m_bits}
    probe = (
        spark.range(lo, hi)
        .crossJoin(F.broadcast(bloom_df))
        .select("id", bloom_might_contain(F.col("id"), F.col("bloom"), **kw).alias("hit"))
    )
    return {r["id"] for r in probe.collect() if r["hit"]}


def test_bloom_no_false_negatives_and_low_fp(spark):
    from mapreduce_sm_spark.functions.bloom import bloom_build

    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    bl = bloom_build(keys, "k")
    hits = _hits(spark, bl, 0, 5000)
    assert set(range(500)) <= hits, "false negative: theorem violated"
    fp = len(hits - set(range(500)))
    assert fp <= 45, f"fp rate implausible for geometry: {fp}/4500"


def test_bloom_saturated_geometry_yields_false_positives(spark):
    from mapreduce_sm_spark.functions.bloom import bloom_build

    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    bl = bloom_build(keys, "k", m_bits=1024)
    hits = _hits(spark, bl, 0, 2000, m_bits=1024)
    assert set(range(500)) <= hits
    assert len(hits - set(range(500))) > 100, "saturated filter should FP"


def test_bloom_merge_equals_build_over_union(spark):
    from mapreduce_sm_spark.functions.bloom import bloom_build, bloom_merge

    a_keys = spark.range(0, 300).select(F.col("id").alias("k"))
    b_keys = spark.range(200, 600).select(F.col("id").alias("k"))
    u_keys = spark.range(0, 600).select(F.col("id").alias("k"))
    merged = bloom_merge(bloom_build(a_keys, "k"), bloom_build(b_keys, "k"))
    direct = bloom_build(u_keys, "k")
    m = merged.collect()[0]["bloom"]
    d = direct.collect()[0]["bloom"]
    assert dict(m) == dict(d), "merge law broken: OR-merge != build(union)"


def test_bloom_build_word_count_bounded(spark):
    from mapreduce_sm_spark.functions.bloom import BLOOM_M_BITS, bloom_build

    keys = spark.range(0, 10_000).select(F.col("id").alias("k"))
    bl = bloom_build(keys, "k").collect()[0]["bloom"]
    assert len(bl) <= BLOOM_M_BITS // 64
    assert all(0 <= w < BLOOM_M_BITS // 64 for w in bl)


def test_bloom_filter_frame_carries_geometry(spark):
    from mapreduce_sm_spark.functions.bloom import (
        BLOOM_M_BITS,
        BLOOM_SEEDS,
        bloom_build,
    )

    keys = spark.range(0, 100).select(F.col("id").alias("k"))
    bl = bloom_build(keys, "k")
    assert bl.columns == ["bloom", "m_bits", "seeds"]
    row = bl.collect()[0]
    assert row["m_bits"] == BLOOM_M_BITS
    assert tuple(row["seeds"]) == BLOOM_SEEDS


def test_bloom_merge_geometry_mismatch_raises(spark):
    import pytest

    from mapreduce_sm_spark.functions.bloom import bloom_build, bloom_merge

    keys = spark.range(0, 100).select(F.col("id").alias("k"))
    a = bloom_build(keys, "k")
    b = bloom_build(keys, "k", m_bits=1024)
    with pytest.raises(Exception, match="geometry"):
        bloom_merge(a, b).collect()


def test_bloom_merge_guard_survives_column_pruning(spark):
    """Pins the ADVICE r09 fix: the mismatch guard must ride the 'bloom'
    column itself, not only m_bits — a consumer that selects just the
    filter map (the normal probe-without-stored-geometry shape) must
    still hit the raise, or Catalyst column-prunes the guard away and a
    merge of differently-built filters silently succeeds."""
    import pytest

    from mapreduce_sm_spark.functions.bloom import bloom_build, bloom_merge

    keys = spark.range(0, 100).select(F.col("id").alias("k"))
    a = bloom_build(keys, "k")
    b = bloom_build(keys, "k", m_bits=1024)
    with pytest.raises(Exception, match="geometry"):
        bloom_merge(a, b).select("bloom").collect()
    # matching geometry still passes through every projection
    ok = bloom_merge(a, bloom_build(keys, "k")).select("bloom").collect()
    assert len(ok) == 1 and ok[0]["bloom"]


def test_bloom_probe_geometry_mismatch_raises(spark):
    import pytest

    from mapreduce_sm_spark.functions.bloom import bloom_build, bloom_might_contain

    keys = spark.range(0, 100).select(F.col("id").alias("k"))
    bl = bloom_build(keys, "k", m_bits=1024)  # stored geometry: 1024 bits
    probe = (
        spark.range(0, 10)
        .crossJoin(F.broadcast(bl))
        .select(
            bloom_might_contain(  # probe geometry: the default (2^17 bits)
                F.col("id"),
                F.col("bloom"),
                stored_geometry=(F.col("m_bits"), F.col("seeds")),
            ).alias("hit")
        )
    )
    with pytest.raises(Exception, match="geometry"):
        probe.collect()


def test_bloom_probe_matching_geometry_passes_guard(spark):
    from mapreduce_sm_spark.functions.bloom import bloom_build, bloom_might_contain

    keys = spark.range(0, 100).select(F.col("id").alias("k"))
    bl = bloom_build(keys, "k")
    probe = (
        spark.range(0, 100)
        .crossJoin(F.broadcast(bl))
        .select(
            bloom_might_contain(
                F.col("id"),
                F.col("bloom"),
                stored_geometry=(F.col("m_bits"), F.col("seeds")),
            ).alias("hit")
        )
    )
    assert all(r["hit"] for r in probe.collect())


def test_bloom_semi_prune_contract(spark, duck):
    from mapreduce_sm_spark.operators.sketches import bloom_semi_prune_orders

    df = bloom_semi_prune_orders(spark, SF_DIR)
    assert df.columns == [
        "o_orderstatus", "n_members", "member_cents",
        "bloom_no_false_negatives", "bloom_fp_under_1pct",
    ]
    rows = df.collect()
    assert all(
        r["bloom_no_false_negatives"] and r["bloom_fp_under_1pct"] for r in rows
    )
    exact = {
        s: (n, c)
        for s, n, c in duck.execute(
            "SELECT o_orderstatus, count(*),"
            " CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT)"
            " FROM orders WHERE o_custkey IN"
            " (SELECT c_custkey FROM customer WHERE c_mktsegment='BUILDING')"
            " GROUP BY o_orderstatus"
        ).fetchall()
    }
    for r in rows:
        n, c = exact.get(r["o_orderstatus"], (0, 0))
        assert r["n_members"] == n
        assert r["member_cents"] == c


def test_bloom_reuse_prune_contract_and_plan(spark, duck):
    from mapreduce_sm_spark.operators.sketches import bloom_reuse_prune_orders

    df = bloom_reuse_prune_orders(spark, SF_DIR)
    assert df.columns == [
        "o_orderstatus", "n_members", "member_cents", "geometry_roundtrip_ok",
    ]
    exact = {
        s: (n, c)
        for s, n, c in duck.execute(
            "SELECT o_orderstatus, count(*),"
            " CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT)"
            " FROM orders WHERE o_custkey IN"
            " (SELECT c_custkey FROM customer WHERE c_mktsegment='BUILDING')"
            " GROUP BY o_orderstatus"
        ).fetchall()
    }
    rows = df.collect()
    assert {r["o_orderstatus"] for r in rows} == set(exact)
    for r in rows:
        n, c = exact[r["o_orderstatus"]]
        assert (r["n_members"], r["member_cents"]) == (n, c)
        assert r["geometry_roundtrip_ok"]

    # scale posture: the fact side is NEVER shuffled on the join key — the
    # probe is a filter under the scan, the re-check a broadcast join; the
    # only hash exchange is the final status rollup.
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(o_custkey" not in plan, plan[:1200]
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
