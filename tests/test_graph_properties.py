"""Property tests: the distributed graph kernels must agree with direct
pure-Python reference implementations on arbitrary small graphs — not
just the hand-picked shapes in test_graph.py. Hypothesis drives the edge
sets; examples are capped because each case runs a real Spark plan."""

from __future__ import annotations

from collections import Counter, defaultdict
from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mapreduce_sm_spark.operators.graph import pagerank_int, triangle_stats

# --- pure-Python references -------------------------------------------------


def _ref_triangle(edge_set):
    nodes = sorted({x for e in edge_set for x in e})
    deg = Counter(x for e in edge_set for x in e)
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    tris = sum(
        1
        for a, b, c in combinations(nodes, 3)
        if frozenset((a, b)) in edge_set
        and frozenset((a, c)) in edge_set
        and frozenset((b, c)) in edge_set
    )
    return (len(nodes), len(edge_set), wedges, tris)


def _ref_pagerank(edges, iterations, mass):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    outdeg = Counter(u for u, _ in edges)
    r = {v: mass // n for v in nodes}
    base = (15 * (mass // n)) // 100
    for _ in range(iterations):
        in_sum = defaultdict(int)
        for u, v in edges:
            in_sum[v] += r[u] // outdeg[u]
        dang = sum(r[v] for v in nodes if v not in outdeg)
        share = dang // n
        r = {
            v: base + (85 * (in_sum.get(v, 0) + share)) // 100 for v in nodes
        }
    return r


# --- strategies -------------------------------------------------------------

_undirected_edges = st.sets(
    st.tuples(st.integers(0, 6), st.integers(0, 6)).map(
        lambda t: (min(t), max(t))
    ).filter(lambda t: t[0] != t[1]),
    min_size=1,
    max_size=15,
)

_directed_edges = st.sets(
    st.tuples(
        st.sampled_from("abcdefg"), st.sampled_from("abcdefg")
    ).filter(lambda t: t[0] != t[1]),
    min_size=1,
    max_size=15,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=_undirected_edges)
def test_triangle_stats_matches_bruteforce(spark, edges):
    df = spark.createDataFrame(sorted(edges), "p1 long, p2 long")
    got = tuple(triangle_stats(df).collect()[0])
    want = _ref_triangle({frozenset(e) for e in edges})
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=_directed_edges)
def test_pagerank_matches_reference_fold(spark, edges):
    df = spark.createDataFrame(sorted(edges), "src string, dst string")
    got = {
        r["node"]: r["rank"] for r in pagerank_int(df, 2, 10**6).collect()
    }
    assert got == _ref_pagerank(edges, 2, 10**6)
