"""HLL sketch reach estimates: bounded against exact distinct counts.

The registered hll_user_reach emits the CONTRACT (exact_users +
hll_within_bound, oracled in the registry); these tests pin the raw
estimates behind that contract via the unregistered hll_estimates
readout: every per-type estimate must sit within 5% of the exact
distinct-user count (documented HLL_4 lgK=12 relative standard error is
~1.6%), and the 'ALL' row — produced by sketch UNION, not a rescan —
must match the exact global count to the same tolerance and dominate
every per-type estimate."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_hll_estimates_within_tolerance_of_exact(spark, duck):
    from mapreduce_sm_spark.operators.sketches import hll_estimates

    rows = hll_estimates(spark, SF_DIR).collect()
    got = {r["event_type"]: (r["approx_users"], r["exact_users"]) for r in rows}
    exact = dict(
        duck.execute(
            "SELECT event_type, count(DISTINCT user_id) FROM events GROUP BY event_type"
        ).fetchall()
    )
    exact["ALL"] = duck.execute(
        "SELECT count(DISTINCT user_id) FROM events"
    ).fetchone()[0]

    assert set(got) == set(exact)
    for k, (est, engine_exact) in got.items():
        # the engine's own exact column must BE exact (vs DuckDB)
        assert engine_exact == exact[k], f"{k}: exact {engine_exact} vs {exact[k]}"
        assert abs(est - exact[k]) <= max(1, 0.05 * exact[k]), (
            f"{k}: estimate {est} vs exact {exact[k]}"
        )
    assert got["ALL"][0] >= max(v[0] for k, v in got.items() if k != "ALL")


def test_hll_reach_contract_schema_and_determinism(spark):
    from mapreduce_sm_spark.operators.sketches import hll_user_reach

    df = hll_user_reach(spark, SF_DIR)
    assert df.columns == ["event_type", "exact_users", "hll_within_bound"]
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "string", "bigint", "boolean",
    ]
    a = [tuple(r) for r in df.collect()]
    # the contract booleans are the whole point: all must hold
    assert all(r[2] is True for r in a), a
    # sketches are deterministic for a fixed input and lgK: two runs agree
    b = [tuple(r) for r in hll_user_reach(spark, SF_DIR).collect()]
    assert a == b
