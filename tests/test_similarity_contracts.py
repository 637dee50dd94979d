"""Contracts around the approximate similarity operators.

- embedding_similar_pairs is banded LSH with documented recall < 1: bound
  its missed-pair rate against the unbanded all-pairs ground truth
  (ADVICE r2: the oracle mirrors the bands, so parity alone no longer
  proves recall — this test is the independent check).
- ann_ivf_recall_check emits the driver-checkable IVF contract; every
  boolean must be true on the fixture.
"""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_banded_pairs_recall_bound(spark, duck):
    from mapreduce_sm_spark.functions.vectors import cosine_sql
    from mapreduce_sm_spark.operators.similarity import (
        _PAIRS_THRESHOLD,
        embedding_similar_pairs,
    )

    banded = {
        (r.vec_a, r.vec_b)
        for r in embedding_similar_pairs(spark, SF_DIR).collect()
    }
    truth = {
        (a, b)
        for a, b in duck.execute(
            f"""
            SELECT a.vec_id, b.vec_id
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE round({cosine_sql('a.embedding', 'b.embedding')}, 6)
                  >= {_PAIRS_THRESHOLD}
            """
        ).fetchall()
    }
    # no false positives: every banded pair is a true pair (exact verify)
    assert banded <= truth
    # bounded misses: banding may drop weakly-similar pairs, but the
    # documented ~86% per-pair recall must hold in aggregate
    if truth:
        missed = 1.0 - len(banded) / len(truth)
        assert missed <= 0.30, f"missed-pair rate {missed:.2f} over bound"


def test_ivf_recall_contract_all_true(spark):
    from mapreduce_sm_spark.operators.similarity import (
        _N_QUERIES,
        ann_ivf_recall_check,
    )

    rows = ann_ivf_recall_check(spark, SF_DIR).collect()
    assert len(rows) == _N_QUERIES
    for r in rows:
        assert r.k_ivf == 5
        assert r.recall_ok, f"q{r.q_id} recall below floor"
        assert r.bounded_ok, f"q{r.q_id} IVF cosine beat exact at some rank"


def test_set_front_rejects_unknown_and_duplicate_names():
    import pytest

    from mapreduce_sm_spark.registry import Registry

    reg = Registry()

    @reg.register("a", oracle=None)
    def qa(spark, sf_dir):  # pragma: no cover - never executed
        raise NotImplementedError

    with pytest.raises(ValueError, match="unknown"):
        reg.set_front(("a", "typo_name"))
    reg.set_front(("a", "typo_name"), allow_missing=True)  # explicit opt-out
    with pytest.raises(ValueError, match="duplicate"):
        reg.set_front(("a", "a"))


def test_ann_scale_ceilings_raise():
    """The small-side assumptions are enforced, not implicit (SCALING.md
    'ANN ceilings'): an over-ceiling broadcast query side or k-means K
    must fail loudly with the redirect message."""
    import pytest

    from mapreduce_sm_spark.operators import similarity as sim

    with pytest.raises(ValueError, match="bucketed LSH/IVF"):
        sim._assert_broadcastable_query_side(sim._MAX_BROADCAST_QUERIES + 1)
    sim._assert_broadcastable_query_side(sim._MAX_BROADCAST_QUERIES)  # at cap: ok

    with pytest.raises(ValueError, match="SPARKSM_MAX_KMEANS_K"):
        sim._kmeans_centroids(None, None, sim._MAX_KMEANS_K + 1, 1)
