"""Empty-input robustness: every batch operator must return an empty (or
well-defined global-aggregate) result on zero-row tables — not crash.
A real pipeline hits empty partitions/dates constantly; an engine that
NPEs on them doesn't survive production."""

from __future__ import annotations

import os

import pytest

from mapreduce_sm_spark.registry import load_all_operators
from mapreduce_sm_spark.session import TABLES, table
from tests.conftest import SF_DIR

# streaming queries drive availableNow runs wired to the events fixture
# layout; their empty-input behavior is the file-source's (no files -> no
# batches), exercised separately in test_streaming.
_SKIP = {"stream_stateful_user_totals", "stream_interval_join"}


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TABLES:
        # table() handles the events TIMESTAMP(NANOS) read; the empty
        # rewrite stores micros, which table() passes through unchanged
        df = table(spark, SF_DIR, t).limit(0)
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )
    # events is read via session.table with the nanos flag; the rewritten
    # empty file stores micros already, which table() passes through
    return out


def test_all_batch_queries_survive_empty_inputs(spark, empty_sf_dir):
    registry = load_all_operators()
    failures = []
    for name, q in registry.all().items():
        if name in _SKIP:
            continue
        try:
            rows = q.fn(spark, empty_sf_dir).collect()
            # global aggregates may legitimately return one (null-ish) row;
            # fixed-shape reports (calendar spine, per-column profile) keep
            # their structural rows with zero counts
            assert len(rows) <= 1 or name in (
                "calendar_spine_orders",
                "profile_orders_columns",
                # fixed 2-row reports: one row per compared set pair
                "kmv_audience_overlap",
                "kmv_anotb_difference",
                # fixed 6-row report: one row per quantile level, NULL
                # estimates on an empty corpus (ADVICE r10)
                "quantile_sketch_order_price",
            ), f"{name} returned {len(rows)} rows on empty input"
        except AssertionError:
            raise
        except Exception as e:  # noqa: BLE001
            failures.append((name, str(e).splitlines()[0][:120]))
    assert not failures, f"queries crashed on empty inputs: {failures}"


def test_kmv_empty_fixture_value_parity(spark, empty_sf_dir):
    """Pins the ADVICE r09 fix at VALUE level (the blanket empty-input test
    above is rows-only): on empty sets the engine emits count semantics
    (kappa = 0, est_inter = 0) and the oracle's sum() must be COALESCEd
    to match — a NULL-vs-0 divergence here is exactly what the row-count
    check cannot see."""
    import duckdb

    from mapreduce_sm_spark.registry import load_all_operators
    from mapreduce_sm_spark.session import TABLES

    registry = load_all_operators()
    q = registry.all()["kmv_audience_overlap"]
    got = {
        r["set_pair"]: (r["kappa"], r["est_inter"], r["n_merged"])
        for r in q.fn(spark, empty_sf_dir).collect()
    }
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{empty_sf_dir}/{t}.parquet/*.parquet'")
    cur = con.execute(q.oracle)
    cols = [d[0] for d in cur.description]
    want = {}
    for row in cur.fetchall():
        d = dict(zip(cols, row))
        want[d["set_pair"]] = (d["kappa"], d["est_inter"], d["n_merged"])
    assert got == want, (got, want)
    for kappa, est_inter, n_merged in got.values():
        assert (kappa, est_inter, n_merged) == (0, 0, 0)


def test_qsketch_empty_fixture_value_parity(spark, empty_sf_dir):
    """Pins the ADVICE r10 fix at VALUE level: on an empty corpus both the
    engine and the DuckDB oracle emit the 6 level rows with NULL
    est_cents/exact_cents, est_rank 0, n_rows 0, k_used 0 — the engine's
    old inner joins emitted 0 rows, a divergence the rows-only blanket
    test above cannot see."""
    import duckdb

    from mapreduce_sm_spark.registry import load_all_operators
    from mapreduce_sm_spark.session import TABLES

    registry = load_all_operators()
    q = registry.all()["quantile_sketch_order_price"]
    got = {
        r["level_ppm"]: (
            r["est_cents"], r["exact_cents"], r["est_rank"],
            r["n_rows"], r["k_used"],
        )
        for r in q.fn(spark, empty_sf_dir).collect()
    }
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{empty_sf_dir}/{t}.parquet/*.parquet'"
        )
    cur = con.execute(q.oracle)
    cols = [d[0] for d in cur.description]
    want = {}
    for row in cur.fetchall():
        d = dict(zip(cols, row))
        want[d["level_ppm"]] = (
            d["est_cents"], d["exact_cents"], d["est_rank"],
            d["n_rows"], d["k_used"],
        )
    assert got == want, (got, want)
    assert len(got) == 6
    for est_c, exact_c, est_rank, n_rows, k_used in got.values():
        assert (est_c, exact_c) == (None, None)
        assert (est_rank, n_rows, k_used) == (0, 0, 0)
