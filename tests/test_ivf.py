"""IVF ANN correctness: probing every cell degenerates to exact search,
which validates index build, assignment, and ranking; cell pruning is
checked structurally via the probe list."""

from tests.conftest import SF_DIR


def test_ivf_full_probe_equals_bruteforce(spark):
    from mapreduce_sm_spark.operators.similarity import (
        _IVF_K,
        ann_bruteforce_topk,
        _ivf_topk,
    )

    exact = {
        (r.q_id, r.rank): (r.c_id, r.cos)
        for r in ann_bruteforce_topk(spark, SF_DIR).collect()
    }
    full_probe = {
        (r.q_id, r.rank): (r.c_id, r.cos)
        for r in _ivf_topk(spark, SF_DIR, nprobe=_IVF_K).collect()
    }
    assert full_probe == exact


def test_ivf_pruned_probe_is_subset_and_ranked(spark):
    from mapreduce_sm_spark.operators.similarity import (
        _N_QUERIES,
        _TOP_K,
        ann_ivf_topk,
    )

    rows = ann_ivf_topk(spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    assert len(by_q) == _N_QUERIES
    for q_id, rs in by_q.items():
        assert len(rs) <= _TOP_K
        sims = [r.cos for r in sorted(rs, key=lambda r: r.rank)]
        assert sims == sorted(sims, reverse=True)
        assert all(r.c_id != q_id for r in rs)
