"""Property-based tests (SURVEY §5.2.3): the text/hash primitives hold
their contracts on arbitrary inputs, not just fixture data."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

# ASCII-ish text including quotes/punctuation; the fixture corpus is ASCII
TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=80
)


def _spark_rows(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


@settings(max_examples=20, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_tokenize_matches_reference_grammar(spark, texts):
    """tokenize_words == the reference scanner's intent: maximal runs of
    [A-Za-z][A-Za-z']* uppercased (wordcount.c:56-92, minus its
    chunk-boundary bugs)."""
    from pyspark.sql import functions as F

    from mapreduce_sm_spark.functions.text import tokenize_words

    got = (
        _spark_rows(spark, texts)
        .select(tokenize_words("text").alias("toks"))
        .collect()
    )
    for row, t in zip(got, texts):
        expected = re.findall(r"[A-Z][A-Z']*", t.upper())
        assert list(row.toks) == expected


@settings(max_examples=20, deadline=None)
@given(st.lists(TEXT.filter(lambda t: len(t) > 0), min_size=1, max_size=8))
def test_char_shingles_cover_string(spark, texts):
    """every k-shingle is a substring; count = max(len-k+1, 1)."""
    from mapreduce_sm_spark.functions.text import char_shingles

    k = 5
    got = (
        _spark_rows(spark, texts)
        .select(char_shingles("text", k).alias("sh"))
        .collect()
    )
    for row, t in zip(got, texts):
        assert len(row.sh) == max(len(t) - k + 1, 1)
        for s in row.sh:
            assert s in t


@settings(max_examples=10, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=6))
def test_hash60_portable_and_in_range(spark, texts):
    """hash60 matches DuckDB bit-for-bit and stays in [0, 2^60)."""
    import duckdb

    from mapreduce_sm_spark.functions.hashing import hash60, hash60_sql

    spark_vals = [
        r.h
        for r in _spark_rows(spark, texts)
        .select(hash60("text").alias("h"))
        .collect()
    ]
    con = duckdb.connect()
    duck_vals = [
        con.execute(
            f"SELECT {hash60_sql('?')}", [t]
        ).fetchone()[0]
        for t in texts
    ]
    assert spark_vals == duck_vals
    assert all(0 <= v < (1 << 60) for v in spark_vals)


# ---------------------------------------------------------------------------
# AllPairs/PPJoin candidate-generation completeness: the prefix + length +
# positional filters in operators/dedup.py::dedup_ngram_jaccard must never
# drop a pair the output gate (floor(J*1e4) >= 8000) can admit. This mirrors
# the Spark candidate logic exactly in Python and checks it against brute
# force on random set corpora — guarding the _PREFIX_THRESHOLD=0.78 margin
# and the ceil(t/(1+t)(na+nb)) positional bound.
# ---------------------------------------------------------------------------


def _candidate_pairs_py(docs: list[list[int]], t: float) -> set[tuple[int, int]]:
    import math
    from collections import Counter

    df = Counter(tok for d in docs for tok in set(d))
    ordered = [sorted(set(d), key=lambda x: (df[x], x)) for d in docs]
    pref = [d[: int((1.0 - t) * len(d)) + 2] for d in ordered]
    pos = [{tok: i + 1 for i, tok in enumerate(d)} for d in ordered]
    out = set()
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            na, nb = len(ordered[a]), len(ordered[b])
            if not (nb >= na * t and nb <= na / t):
                continue
            for tok in set(pref[a]) & set(pref[b]):
                bound = 1 + min(na - pos[a][tok], nb - pos[b][tok])
                if bound >= math.ceil(t / (1.0 + t) * (na + nb)):
                    out.add((a, b))
                    break
    return out


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.frozensets(st.integers(0, 12), min_size=3, max_size=12),
        min_size=2,
        max_size=10,
    )
)
def test_prefix_filter_candidates_complete(doc_sets):
    from mapreduce_sm_spark.operators.dedup import (
        _JACCARD_PM4,
        _PREFIX_THRESHOLD,
    )

    docs = [sorted(s) for s in doc_sets]
    docs.append(list(docs[0]))  # guarantee at least one J=1.0 pair
    cands = _candidate_pairs_py(docs, _PREFIX_THRESHOLD)
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            sa, sb = set(docs[a]), set(docs[b])
            j = (len(sa & sb) * 10000) // len(sa | sb)
            if j >= _JACCARD_PM4:
                assert (a, b) in cands, (
                    f"true pair ({a},{b}) J={j} dropped by candidate filters"
                )


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.sampled_from(["en", "de", "fr"]),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_stratified_quota_invariants(spark, rows):
    """Quota sampling contract on arbitrary (doc_id, lang) sets: every
    stratum contributes exactly ceil(n/5) rows, ranks are 1..quota, and
    the sample is a function of doc_ids only (order independent)."""
    import math

    from pyspark.sql import functions as F

    # replay the operator's exact plan against an in-memory frame (the
    # registered query is fixture-bound; the contract is in the plan)
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    from mapreduce_sm_spark.functions.hashing import hash60
    from pyspark.sql import Window

    keyed = df.select(
        "lang",
        "doc_id",
        hash60(F.col("doc_id").cast("string"), salt="strat").alias("h"),
        F.count("*").over(Window.partitionBy("lang")).alias("n_lang"),
    )
    w = Window.partitionBy("lang").orderBy("h", "doc_id")
    out = (
        keyed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= F.expr("(n_lang + 4) DIV 5"))
        .select("lang", "doc_id", "rk")
    ).collect()

    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    n_per_lang = {}
    for doc_id, lang in rows:
        n_per_lang[lang] = n_per_lang.get(lang, 0) + 1
    for lang, n in n_per_lang.items():
        quota = math.ceil(n / 5)
        got = by_lang.get(lang, [])
        assert len(got) == quota, (lang, n, quota, len(got))
        assert sorted(r.rk for r in got) == list(range(1, quota + 1))

    # order independence: shuffling input rows yields the same sample set
    df2 = spark.createDataFrame(list(reversed(rows)), "doc_id long, lang string")
    keyed2 = df2.select(
        "lang",
        "doc_id",
        hash60(F.col("doc_id").cast("string"), salt="strat").alias("h"),
        F.count("*").over(Window.partitionBy("lang")).alias("n_lang"),
    )
    out2 = (
        keyed2.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= F.expr("(n_lang + 4) DIV 5"))
        .select("lang", "doc_id", "rk")
    ).collect()
    assert {(r.lang, r.doc_id) for r in out} == {(r.lang, r.doc_id) for r in out2}


def test_priority_sample_estimator_and_bias(spark, duck):
    """DLT subset-sum estimator sanity: the estimate should land near the
    exact total (deterministic for fixed data+hash; assert a loose 25%
    envelope for k=64), and the sample must be WEIGHT-biased — mean
    sampled weight above the corpus mean — or the weighting is a no-op."""
    from mapreduce_sm_spark.operators.sampling import priority_sample_documents
    from tests.conftest import SF_DIR

    rows = priority_sample_documents(spark, SF_DIR).collect()
    assert len(rows) == 64
    assert [r["rank"] for r in rows] == list(range(1, 65))
    est, tot = rows[0]["est_total_weight"], rows[0]["exact_total_weight"]
    assert abs(est - tot) <= 0.25 * tot, (est, tot)
    (mean_w,) = duck.execute("SELECT avg(n_chars) FROM documents").fetchone()
    sample_mean = sum(r["weight"] for r in rows) / len(rows)
    assert sample_mean > mean_w, "sample is not weight-biased"


def test_priority_sample_exact_when_corpus_fits(spark):
    """Pins the ADVICE r09 fix: with n <= k every item is sampled, DLT
    defines tau = 0, and the subset-sum estimate must equal the exact
    total — not the strict overestimate a min-of-sample tau gives
    (q = w*2^60/(h+1) >= w always)."""
    from pyspark.sql import functions as F

    from mapreduce_sm_spark.operators.sampling import priority_sample

    weights = [3, 17, 101, 999, 42]
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], "doc_id long, w long"
    )
    rows = priority_sample(docs, k=64).collect()
    assert len(rows) == len(weights)
    assert rows[0]["est_total_weight"] == sum(weights)
    assert rows[0]["exact_total_weight"] == sum(weights)
    # boundary: n == k+1 leaves the normal tau path intact (est >= 0, all
    # k rows emitted, tau from the (k+1)-th priority — just sanity here)
    docs2 = spark.createDataFrame(
        [(i, 10 + i) for i in range(6)], "doc_id long, w long"
    )
    rows2 = priority_sample(docs2, k=5).collect()
    assert len(rows2) == 5
    assert rows2[0]["exact_total_weight"] == sum(10 + i for i in range(6))


# ---------------------------------------------------------------------------
# r17 histogram candidate pruning (dedup_ngram_jaccard): the bucket min-sum
# is a GUARANTEED upper bound on |A∩B|, and the pm4 bound derived from it is
# monotone — so a pair passing the exact floor(J*1e4) >= 8000 gate can never
# be pruned. Mirrors the Spark expressions over realistic hash60 values.
# ---------------------------------------------------------------------------


@settings(max_examples=80, deadline=None)
@given(
    st.frozensets(st.integers(0, 4000), min_size=1, max_size=60),
    st.frozensets(st.integers(0, 4000), min_size=1, max_size=60),
)
def test_histogram_prune_bound_conservative(sa_raw, sb_raw):
    from mapreduce_sm_spark.functions.hashing import hash60_py
    from mapreduce_sm_spark.operators.dedup import (
        _JACCARD_PM4,
        _JHIST_B,
        _JHIST_SHIFT,
    )

    sa = {hash60_py(str(x)) for x in sa_raw}
    sb = {hash60_py(str(x)) for x in sb_raw}

    def hist(s):
        h = [0] * _JHIST_B
        for x in s:
            h[x >> _JHIST_SHIFT] += 1
        return h

    ha, hb = hist(sa), hist(sb)
    ub = sum(min(a, b) for a, b in zip(ha, hb))
    inter = len(sa & sb)
    na, nb = len(sa), len(sb)
    # (1) min-sum dominates the true intersection
    assert ub >= inter
    # (2) bucket ids stay inside the histogram (hash60 < 2^60)
    assert all(0 <= x >> _JHIST_SHIFT < _JHIST_B for x in sa | sb)
    # (3) a pair passing the exact gate always passes the pruned gate
    exact_pm4 = (inter * 10000) // (na + nb - inter)
    bound_pm4 = (ub * 10000) // (na + nb - ub)
    if exact_pm4 >= _JACCARD_PM4:
        assert bound_pm4 >= _JACCARD_PM4
