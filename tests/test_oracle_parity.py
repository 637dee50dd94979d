"""Operator-level oracle parity at sf0.001 (the driver's t2 runs sf0.01;
this is the fast inner loop). Uses the same order-insensitive value-hash
comparison as tools/verify_local.py."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR

# no exclusions: every registered query runs against its oracle at sf0.001
# (the two dedup pair miners were skipped in round 1 as slow; banded
# candidates brought them to ~20 s combined, affordable here)
_SKIP: set[str] = set()


def _all_queries():
    from mapreduce_sm_spark.registry import load_all_operators

    return [
        (name, q)
        for name, q in load_all_operators().all().items()
        if name not in _SKIP
    ]


@pytest.mark.parametrize("name,q", _all_queries(), ids=lambda x: x if isinstance(x, str) else "")
def test_query_matches_oracle(spark, duck, name, q):
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from verify_local import _pd_rows, value_hash

    # Both sides through pandas, mirroring the driver's fetch path
    # (toPandas on Spark, .df() on DuckDB). fetchall() hid the r6 class
    # of divergence: DuckDB HUGEINT -> float64 only under a pandas fetch.
    sdf = q.fn(spark, SF_DIR)
    srows = _pd_rows(sdf.toPandas())
    if q.oracle is None:
        assert len(srows) >= 0
        return
    from pyspark.sql.types import DateType

    s_dates = frozenset(
        f.name for f in sdf.schema.fields if isinstance(f.dataType, DateType)
    )
    odf = duck.execute(q.oracle).df()
    ocols = list(odf.columns)
    orows = _pd_rows(odf)
    o_dates = frozenset(
        col for col, typ, *_ in
        duck.execute(f"DESCRIBE ({q.oracle})").fetchall()
        if typ.upper() == "DATE"
    )
    assert len(srows) == len(orows), f"{name}: rowcount mismatch"
    assert sorted(sdf.columns) == sorted(ocols), f"{name}: column mismatch"
    assert value_hash(sdf.columns, srows, s_dates) == value_hash(
        ocols, orows, o_dates
    ), f"{name}: value-hash mismatch"


# Gate-visible oracle outputs are restricted to the types a pandas fetch
# maps LOSSLESSLY (PLANS.md r07): HUGEINT/UHUGEINT become float64
# ("3" hashes as "3.0" — the r6 driver gate's root cause for all 8
# hash-reds), and DECIMAL renders as float64 under .df(), silently
# blurring drift beyond float64 precision. An ALLOWLIST (not a HUGEINT
# denylist) so any new type joins only after its pandas round-trip is
# reasoned about. DuckDB returns HUGEINT from sum(BIGINT) and propagates
# it through // — wrap final-SELECT expressions in CAST(... AS BIGINT)
# (template: anomaly_zscore_events, operators/behavioral.py).
_ALLOWED_ORACLE_TYPES = {
    "BIGINT",
    "INTEGER",
    "DOUBLE",
    "VARCHAR",
    "BOOLEAN",
    "DATE",
}


@pytest.mark.parametrize(
    "name,q",
    [(n, q) for n, q in _all_queries() if q.oracle is not None],
    ids=lambda x: x if isinstance(x, str) else "",
)
def test_oracle_output_types_pandas_safe(duck, name, q):
    desc = duck.execute(f"DESCRIBE ({q.oracle})").fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in desc
        if typ.upper().split("(")[0] not in _ALLOWED_ORACLE_TYPES
    ]
    assert not bad, (
        f"{name}: oracle emits output column(s) outside the pandas-safe "
        f"allowlist {sorted(_ALLOWED_ORACLE_TYPES)}: {bad}"
    )
