"""dedup_minhash_incremental must equal dedup_minhash minus OLD-OLD pairs.

The incremental variant restricts the band join's PROBE side to the NEW
fifth of the id space (larger id of any qualifying pair is always the
NEW one, ids being monotone), so its result is definitionally the full
pair set filtered to doc_b >= T. The shared-machinery implementation
makes that non-trivial to get wrong in only one direction — this test
pins BOTH directions: no OLD-OLD pair leaks in, and no NEW-touching
pair is lost by the asymmetric probe."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_incremental_equals_full_minus_old_old(spark):
    from mapreduce_sm_spark.operators.dedup import (
        dedup_minhash,
        dedup_minhash_incremental,
    )
    from mapreduce_sm_spark.session import table

    t = (
        table(spark, SF_DIR, "documents")
        .selectExpr("4 * max(doc_id) div 5 AS t")
        .first()["t"]
    )
    full = {tuple(r) for r in dedup_minhash(spark, SF_DIR).collect()}
    incr = {tuple(r) for r in dedup_minhash_incremental(spark, SF_DIR).collect()}
    expected = {p for p in full if p[1] >= t}
    assert incr == expected
    # the split is non-degenerate on the fixtures: some pairs touch the
    # new batch and some are OLD-OLD (otherwise the test proves nothing)
    assert 0 < len(incr) < len(full)
