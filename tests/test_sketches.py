"""HLL sketch reach estimates: bounded against exact distinct counts.

hll_user_reach has no SQL oracle (the estimate is DataSketches-defined),
so correctness is pinned here instead: every per-type estimate must sit
within 5% of the exact distinct-user count (documented HLL_4 lgK=12
relative standard error is ~1.6%), and the 'ALL' row — produced by
sketch UNION, not a rescan — must match the exact global count to the
same tolerance and dominate every per-type estimate."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_hll_reach_within_tolerance_of_exact(spark, duck):
    from mapreduce_sm_spark.operators.sketches import hll_user_reach

    got = {r["event_type"]: r["approx_users"] for r in
           hll_user_reach(spark, SF_DIR).collect()}
    exact = dict(
        duck.execute(
            "SELECT event_type, count(DISTINCT user_id) FROM events GROUP BY event_type"
        ).fetchall()
    )
    exact["ALL"] = duck.execute(
        "SELECT count(DISTINCT user_id) FROM events"
    ).fetchone()[0]

    assert set(got) == set(exact)
    for k, est in got.items():
        assert abs(est - exact[k]) <= max(1, 0.05 * exact[k]), (
            f"{k}: estimate {est} vs exact {exact[k]}"
        )
    assert got["ALL"] >= max(v for k, v in got.items() if k != "ALL")


def test_hll_reach_schema_and_determinism(spark):
    from mapreduce_sm_spark.operators.sketches import hll_user_reach

    df = hll_user_reach(spark, SF_DIR)
    assert df.columns == ["event_type", "approx_users"]
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "string", "bigint",
    ]
    # sketches are deterministic for a fixed input and lgK: two runs agree
    a = [tuple(r) for r in df.collect()]
    b = [tuple(r) for r in hll_user_reach(spark, SF_DIR).collect()]
    assert a == b
