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
    from verify_local import value_hash

    sdf = q.fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    if q.oracle is None:
        assert len(srows) >= 0
        return
    res = duck.execute(q.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert len(srows) == len(orows), f"{name}: rowcount mismatch"
    assert sorted(sdf.columns) == sorted(ocols), f"{name}: column mismatch"
    assert value_hash(sdf.columns, srows) == value_hash(ocols, orows), (
        f"{name}: value-hash mismatch"
    )
