"""Hand-traced fixtures for the r16 registrations: filtered ANN,
DSIR importance selection, length-bucket padding stats, boilerplate
prefix detection. Each op also runs in the all-query oracle-parity
sweep; these pin the hand-computable semantics the sweep can't isolate
(planted positives, ties, degenerate corpora)."""

from __future__ import annotations

import duckdb

from mapreduce_sm_spark.operators.sampling import (
    _DSIR_ORACLE,
    dsir_importance_selection,
)
from mapreduce_sm_spark.operators.sharding import (
    _PAD_ORACLE,
    length_bucket_padding_stats,
)
from mapreduce_sm_spark.operators.similarity import ann_filtered_topk
from mapreduce_sm_spark.operators.text_analysis import (
    _BP_ORACLE,
    boilerplate_prefix_stats,
)


def _write_docs(spark, tmp_path, rows):
    d = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        rows, "doc_id long, source string, text string, n_chars long"
    ).coalesce(1).write.parquet(d)
    return d


def _duck(path):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}/*.parquet'")
    return con


# --- length_bucket_padding_stats -------------------------------------------


def test_padding_stats_hand_computed(spark, tmp_path):
    """tok=1 -> bucket 16 (waste (16-1)*1000 DIV 16 = 937); tok=0 (no
    letter tokens) also lands in the 16 floor bucket; tok=17 -> 32
    (waste 468); 300 tokens truncate to the 128 budget -> bucket 128,
    waste 0."""
    long_doc = " ".join(["w"] * 300)
    seventeen = " ".join(["w"] * 17)
    d = _write_docs(
        spark,
        tmp_path,
        [
            (1, "s", "a", 1),
            (2, "s", "1 2 3", 5),  # zero word tokens
            (3, "s", seventeen, len(seventeen)),
            (4, "s", long_doc, len(long_doc)),
        ],
    )
    rows = [
        tuple(r)
        for r in length_bucket_padding_stats(spark, str(tmp_path)).collect()
    ]
    assert rows == [
        (16, 2, 1, 256, 32, 968),  # docs 1 and 2: real 1+0
        (32, 1, 17, 128, 32, 468),
        (128, 1, 128, 128, 128, 0),
    ]
    assert _duck(d).sql(_PAD_ORACLE).fetchall() == rows


def test_padding_stats_empty_corpus(spark, tmp_path):
    d = _write_docs(spark, tmp_path, [])
    assert length_bucket_padding_stats(spark, str(tmp_path)).collect() == []
    assert _duck(d).sql(_PAD_ORACLE).fetchall() == []


# --- boilerplate_prefix_stats -----------------------------------------------


def test_boilerplate_planted_template_and_tie(spark, tmp_path):
    """sA: 2 of 3 docs share the FOO BAR BAZ template prefix -> share
    666 pm over 2 distinct prefixes. sB: 1-token doc, prefix is the
    whole (short) token list. sC: designed tie (two singleton
    prefixes) broken by prefix ASC."""
    d = _write_docs(
        spark,
        tmp_path,
        [
            (1, "sA", "foo bar baz one", 15),
            (2, "sA", "foo bar baz two", 15),
            (3, "sA", "foo bar qux", 11),
            (4, "sB", "hi", 2),
            (5, "sC", "b b b", 5),
            (6, "sC", "a a a", 5),
        ],
    )
    rows = [
        tuple(r)
        for r in boilerplate_prefix_stats(spark, str(tmp_path)).collect()
    ]
    assert rows == [
        ("sA", 3, 2, "FOO BAR BAZ", 2, 666),
        ("sB", 1, 1, "HI", 1, 1000),
        ("sC", 2, 2, "A A A", 1, 500),
    ]
    assert _duck(d).sql(_BP_ORACLE).fetchall() == rows


def test_boilerplate_empty_corpus(spark, tmp_path):
    d = _write_docs(spark, tmp_path, [])
    assert boilerplate_prefix_stats(spark, str(tmp_path)).collect() == []
    assert _duck(d).sql(_BP_ORACLE).fetchall() == []


# --- dsir_importance_selection ----------------------------------------------


def test_dsir_hand_computed_selection(spark, tmp_path):
    """Target slice (doc_id 10) is all X -> pm_t[X]=1000, pm_t[Y]=0.
    Raw: doc1 'x x y', doc2 'y y' -> nr=5, pm_r[X]=400, pm_r[Y]=600.
    doc1 score = 2*(1000-400) + 1*(0-600) = 600 > 0 -> selected.
    doc2 score = 2*(0-600) = -1200 -> rejected (and sB's max_score is
    the real -1200, not a coalesced 0). doc3 has no word tokens ->
    score coalesces to 0, counted in n_train, not selected."""
    d = _write_docs(
        spark,
        tmp_path,
        [
            (10, "tgt", "x x x x", 7),
            (1, "sA", "x x y", 5),
            (2, "sB", "y y", 3),
            (3, "sB", "123", 3),
        ],
    )
    rows = [
        tuple(r)
        for r in dsir_importance_selection(spark, str(tmp_path)).collect()
    ]
    assert rows == [
        ("sA", 1, 1, 1000, 600, 600),
        ("sB", 2, 0, 0, 0, 0),
    ]
    assert _duck(d).sql(_DSIR_ORACLE).fetchall() == rows


def test_dsir_empty_target_slice_selects_nothing(spark, tmp_path):
    """No doc_id%10==0 docs -> nt=0 -> pm_t all 0 -> every score is
    -sum(c*pm_r) <= 0 -> nothing selected, in both engines. Raw dist:
    nr=4, pm_r[X]=pm_r[Y]=500; doc1 = 2*(-500)+1*(-500) = -1500,
    doc2 = 1*(-500) = -500 -> max_score is the real -500."""
    d = _write_docs(
        spark, tmp_path, [(1, "sA", "x x y", 5), (2, "sA", "y", 1)]
    )
    rows = [
        tuple(r)
        for r in dsir_importance_selection(spark, str(tmp_path)).collect()
    ]
    assert rows == [("sA", 2, 0, 0, 0, -500)]
    assert _duck(d).sql(_DSIR_ORACLE).fetchall() == rows


def test_dsir_empty_corpus(spark, tmp_path):
    d = _write_docs(spark, tmp_path, [])
    assert dsir_importance_selection(spark, str(tmp_path)).collect() == []
    assert _duck(d).sql(_DSIR_ORACLE).fetchall() == []


# --- ann_filtered_topk --------------------------------------------------------


def test_filtered_ann_excludes_closer_cross_label_neighbor(spark, tmp_path):
    """vec2 (label 2) is cosine-identical to query vec0 (label 1) but
    MUST be excluded by the label filter; vec0's only neighbor is the
    same-label vec1. vec2's own label block is a singleton -> no rows."""
    e = str(tmp_path / "embeddings.parquet")
    spark.createDataFrame(
        [
            (0, [1.0, 0.0], 1),
            (1, [1.0, 0.1], 1),
            (2, [1.0, 0.0], 2),
        ],
        "vec_id long, embedding array<float>, label int",
    ).coalesce(1).write.parquet(e)
    rows = [
        (r["q_id"], r["c_id"], r["rank"])
        for r in ann_filtered_topk(spark, str(tmp_path)).collect()
    ]
    assert rows == [(0, 1, 1), (1, 0, 1)]


# --- dedup_containment_pairs (wave 2) ----------------------------------------


def test_containment_planted_excerpt_is_directed(spark, tmp_path):
    """docA's text is a verbatim substring of docB -> every A-shingle is
    a B-shingle: C(A->B) = 10000 exactly, while C(B->A) stays under the
    0.8 gate (B is much longer) — the directed signal symmetric Jaccard
    misses. docC shares nothing. Both engines byte-equal."""
    import duckdb

    from mapreduce_sm_spark.operators.dedup import (
        _CONTAIN_ORACLE,
        dedup_containment_pairs,
    )

    excerpt = "the quick brown fox jumps over the lazy dog"
    container = (
        "opening words before the excerpt now " + excerpt
        + " and a long closing passage that keeps the container's own "
        "shingle set far larger than the excerpt's"
    )
    d = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        [
            (1, excerpt, "en", "sA", len(excerpt)),
            (2, container, "en", "sA", len(container)),
            (3, "completely unrelated text with zero shared windows",
             "en", "sB", 49),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(d)
    rows = [
        tuple(r) for r in dedup_containment_pairs(spark, str(tmp_path)).collect()
    ]
    assert rows == [(1, 2, 10000)]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/*.parquet'")
    assert con.sql(_CONTAIN_ORACLE).fetchall() == rows


def test_containment_empty_corpus(spark, tmp_path):
    from mapreduce_sm_spark.operators.dedup import dedup_containment_pairs

    d = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        [],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(d)
    assert dedup_containment_pairs(spark, str(tmp_path)).collect() == []


# --- embedding_dimension_stats (wave 2) ---------------------------------------


def test_dimension_stats_hand_computed_with_dead_dim(spark, tmp_path):
    """dim1: grids 500/1000; dim2: -500/0; dim3 constant 250 -> dead."""
    import duckdb

    from mapreduce_sm_spark.operators.similarity import (
        _DIMSTATS_ORACLE,
        embedding_dimension_stats,
    )

    e = str(tmp_path / "embeddings.parquet")
    spark.createDataFrame(
        [
            (0, [0.5, -0.5, 0.25], 1),
            (1, [1.0, 0.0, 0.25], 2),
        ],
        "vec_id long, embedding array<float>, label int",
    ).coalesce(1).write.parquet(e)
    rows = [
        tuple(r)
        for r in embedding_dimension_stats(spark, str(tmp_path)).collect()
    ]
    assert rows == [
        (1, 2, 1500, 1250000, 500, 1000, False),
        (2, 2, -500, 250000, -500, 0, False),
        (3, 2, 500, 125000, 250, 250, True),
    ]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{e}/*.parquet'")
    assert con.sql(_DIMSTATS_ORACLE).fetchall() == rows


# --- langid_confusion_matrix (wave 2) ------------------------------------------


def test_langid_confusion_planted_mislabels(spark, tmp_path):
    """3 docs declared 'en': two with English stopwords (agree), one
    with Spanish content -> (en,en) share 666, (en,es) share 333; a
    stopword-free doc declared 'de' lands in (de,unknown) at 1000."""
    import duckdb

    from mapreduce_sm_spark.operators.text_analysis import (
        _LANGID_CONF_ORACLE,
        langid_confusion_matrix,
    )

    d = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        [
            (1, "the cat and the hat", "en", "s", 19),
            (2, "a tale of the sea", "en", "s", 17),
            (3, "el que la vio y que", "en", "s", 19),
            (4, "zzz qqq xxx", "de", "s", 11),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(d)
    rows = [
        tuple(r)
        for r in langid_confusion_matrix(spark, str(tmp_path)).collect()
    ]
    assert rows == [
        ("de", "unknown", 1, 1000),
        ("en", "en", 2, 666),
        ("en", "es", 1, 333),
    ]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/*.parquet'")
    assert con.sql(_LANGID_CONF_ORACLE).fetchall() == rows


# --- winnowing_fingerprint_pairs (wave 3) ---------------------------------------


def _write_docs5(spark, tmp_path, rows):
    """Full 5-column fixture schema (ops that read lang need it)."""
    d = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(d)
    return d


def test_winnowing_planted_shared_passage(spark, tmp_path):
    """docs 1 and 2 share two disjoint passages of >= W+N-1 = 7 tokens;
    the winnowing guarantee forces >= 1 identical selected fingerprint
    per shared passage, so (1,2) clears the n_shared >= 2 gate. doc 3
    shares no 4-gram with anything -> appears in no pair. doc 4 is
    below the N+W-1 token floor -> excluded entirely."""
    from mapreduce_sm_spark.operators.dedup import (
        _WINNOW_ORACLE,
        winnowing_fingerprint_pairs,
    )

    p1 = "alpha beta gamma delta epsilon zeta eta"
    p2 = "one two three four five six seven"
    d = _write_docs5(
        spark,
        tmp_path,
        [
            (1, p1 + " filler aa bb cc dd ee ff gg " + p2, "en", "s", 10),
            (2, p1 + " other uu vv ww xx yy zz qq " + p2, "en", "s", 10),
            (3, "nothing here resembles the planted passages at all "
                "since every window is unique", "en", "s", 10),
            (4, "too short for one window", "en", "s", 10),
        ],
    )
    rows = [
        tuple(r)
        for r in winnowing_fingerprint_pairs(spark, str(tmp_path)).collect()
    ]
    assert len(rows) == 1
    doc_a, doc_b, n_shared = rows[0]
    assert (doc_a, doc_b) == (1, 2)
    assert n_shared >= 2
    assert _duck(d).sql(_WINNOW_ORACLE).fetchall() == rows


def test_winnowing_df_cap_drops_hub_fingerprints(spark, tmp_path):
    """MOSS common-fingerprint drop as a boundary law: CAP identical
    docs -> every fingerprint has df = CAP <= CAP, all C(CAP,2) pairs
    emitted, n_shared equal across pairs; CAP+1 identical docs -> every
    df = CAP+1 > CAP, postings empty, ZERO pairs. Both engines."""
    from mapreduce_sm_spark.operators.dedup import (
        _WINNOW_DF_CAP,
        _WINNOW_ORACLE,
        winnowing_fingerprint_pairs,
    )

    text = "the quick brown fox jumps over the lazy dog again and again"
    cap = _WINNOW_DF_CAP

    d = _write_docs5(
        spark,
        tmp_path,
        [(i, text, "en", "s", len(text)) for i in range(cap)],
    )
    rows = [
        tuple(r)
        for r in winnowing_fingerprint_pairs(spark, str(tmp_path)).collect()
    ]
    assert len(rows) == cap * (cap - 1) // 2
    assert len({r[2] for r in rows}) == 1  # identical docs, equal n_shared
    assert _duck(d).sql(_WINNOW_ORACLE).fetchall() == rows

    over_dir = tmp_path / "over"
    d2p = _write_docs5(
        spark,
        over_dir,
        [(i, text, "en", "s", len(text)) for i in range(cap + 1)],
    )
    assert winnowing_fingerprint_pairs(spark, str(over_dir)).collect() == []
    assert _duck(d2p).sql(_WINNOW_ORACLE).fetchall() == []


def test_winnowing_empty_corpus(spark, tmp_path):
    from mapreduce_sm_spark.operators.dedup import (
        _WINNOW_ORACLE,
        winnowing_fingerprint_pairs,
    )

    d = _write_docs5(spark, tmp_path, [])
    assert winnowing_fingerprint_pairs(spark, str(tmp_path)).collect() == []
    assert _duck(d).sql(_WINNOW_ORACLE).fetchall() == []


# --- quality_classifier_gate (wave 3) -------------------------------------------


def test_quality_classifier_hand_scored(spark, tmp_path):
    """Scores recomputed in-test from hash60_py — the exact fastText-
    shape fold: w(tok) = ((h60(TOK) % 1024) * 2654435761) % 21 - 10.
    A zero-token doc scores exactly 0 and is NOT kept (gate is > 0)."""
    from mapreduce_sm_spark.functions.hashing import hash60_py
    from mapreduce_sm_spark.operators.text_analysis import (
        _QCG_ORACLE,
        quality_classifier_gate,
    )

    def w(tok):
        return ((hash60_py(tok.upper()) % 1024) * 2654435761) % 21 - 10

    s1 = w("ALPHA") + w("BETA") + w("ALPHA")  # multiplicity counts
    s2 = w("GAMMA")
    d = _write_docs(
        spark,
        tmp_path,
        [
            (1, "sA", "alpha beta alpha", 16),
            (2, "sA", "gamma", 5),
            (3, "sB", "123 456", 7),  # zero word tokens -> score 0, not kept
        ],
    )
    kept_a = sum(1 for s in (s1, s2) if s > 0)
    rows = [
        tuple(r) for r in quality_classifier_gate(spark, str(tmp_path)).collect()
    ]
    assert rows == [
        ("sA", 2, kept_a, kept_a * 1000 // 2, s1 + s2),
        ("sB", 1, 0, 0, 0),
    ]
    assert _duck(d).sql(_QCG_ORACLE).fetchall() == rows


def test_quality_classifier_empty_corpus(spark, tmp_path):
    from mapreduce_sm_spark.operators.text_analysis import (
        _QCG_ORACLE,
        quality_classifier_gate,
    )

    d = _write_docs(spark, tmp_path, [])
    assert quality_classifier_gate(spark, str(tmp_path)).collect() == []
    assert _duck(d).sql(_QCG_ORACLE).fetchall() == []


# --- temperature_mixture_weights (wave 3) ---------------------------------------


def test_temperature_weights_hand_computed(spark, tmp_path):
    """sA has 4 tokens -> wgt isqrt(4e4) = 200; sB has 9 -> 300.
    tot 500 -> shares 400000/600000 ppm, 4000/6000 docs per epoch —
    the alpha = 0.5 flattening (a 2.25x size gap becomes 1.5x)."""
    from mapreduce_sm_spark.operators.sampling import (
        _TEMP_ORACLE,
        temperature_mixture_weights,
    )

    d = _write_docs(
        spark,
        tmp_path,
        [
            (1, "sA", "a b", 3),
            (2, "sA", "c d", 3),
            (3, "sB", "e f g h i j k l m", 17),
        ],
    )
    rows = [
        tuple(r)
        for r in temperature_mixture_weights(spark, str(tmp_path)).collect()
    ]
    assert rows == [
        ("sA", 4, 200, 400000, 4000),
        ("sB", 9, 300, 600000, 6000),
    ]
    assert _duck(d).sql(_TEMP_ORACLE).fetchall() == rows


def test_isqrt_exact_on_square_boundaries(spark):
    """The +/-1-corrected isqrt is exact at k^2-1 / k^2 / k^2+1 for k
    spanning small to near the 2^53 double-exactness edge, on BOTH
    engines, matching math.isqrt."""
    import math

    import duckdb

    from mapreduce_sm_spark.operators.sampling import _isqrt_col, _isqrt_sql

    ks = [1, 2, 3, 10, 1000, 94906265, 3037000499]
    xs = sorted(
        {x for k in ks for x in (k * k - 1, k * k, k * k + 1)}
        | {0, 2**63 - 1}
    )
    expected = [math.isqrt(x) for x in xs]

    got_duck = [
        duckdb.sql(f"SELECT {_isqrt_sql(str(x))}").fetchone()[0] for x in xs
    ]
    assert got_duck == expected

    from pyspark.sql import functions as F

    sdf = spark.createDataFrame([(x,) for x in xs], "x long")
    got_spark = [
        r[0]
        for r in sdf.select(_isqrt_col(F.col("x"))).collect()
    ]
    assert got_spark == expected


def test_temperature_weights_empty_corpus(spark, tmp_path):
    from mapreduce_sm_spark.operators.sampling import (
        _TEMP_ORACLE,
        temperature_mixture_weights,
    )

    d = _write_docs(spark, tmp_path, [])
    assert temperature_mixture_weights(spark, str(tmp_path)).collect() == []
    assert _duck(d).sql(_TEMP_ORACLE).fetchall() == []


# --- ngram_novelty_curve (wave 3) -----------------------------------------------


def test_novelty_curve_hand_computed(spark, tmp_path):
    """m = 4, NB = 10 -> buckets doc_id*10//4. doc0 contributes 2 new
    grams of 2; doc1 repeats them (0 of 2); doc2 renews one (1 of 2);
    doc3 has no full 3-gram -> 0 grams but still a counted doc."""
    from mapreduce_sm_spark.operators.corpus_ops import (
        _NOVELTY_ORACLE,
        ngram_novelty_curve,
    )

    d = _write_docs(
        spark,
        tmp_path,
        [
            (0, "s", "a b c d", 7),
            (1, "s", "a b c d", 7),
            (2, "s", "a b c e", 7),
            (3, "s", "hi", 2),
        ],
    )
    rows = [
        tuple(r) for r in ngram_novelty_curve(spark, str(tmp_path)).collect()
    ]
    assert rows == [
        (0, 1, 2, 2, 1000),
        (2, 1, 2, 0, 0),
        (5, 1, 2, 1, 500),
        (7, 1, 0, 0, 0),
    ]
    assert _duck(d).sql(_NOVELTY_ORACLE).fetchall() == rows


def test_novelty_curve_empty_corpus(spark, tmp_path):
    from mapreduce_sm_spark.operators.corpus_ops import (
        _NOVELTY_ORACLE,
        ngram_novelty_curve,
    )

    d = _write_docs(spark, tmp_path, [])
    assert ngram_novelty_curve(spark, str(tmp_path)).collect() == []
    assert _duck(d).sql(_NOVELTY_ORACLE).fetchall() == []


# --- knn_label_noise_audit (wave 3) ---------------------------------------------


def _write_embeddings(spark, tmp_path, rows):
    e = str(tmp_path / "embeddings.parquet")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(e)
    return e


def _duck_emb(path):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{path}/*.parquet'")
    return con


def test_knn_audit_planted_geometry(spark, tmp_path):
    """5 vectors, all in the panel (corpus < panel size). Label 1's
    three vectors cluster on the x axis, label 2's two on the y axis;
    every query's neighbor list is the other 4 vectors, so same-label
    counts are exactly (cluster size - 1) per query: label 1 ->
    n_same 6, agree 6*1000//(3*5) = 400; label 2 -> 2, 200."""
    from mapreduce_sm_spark.operators.similarity import (
        _KNN_AUDIT_ORACLE,
        knn_label_noise_audit,
    )

    e = _write_embeddings(
        spark,
        tmp_path,
        [
            (0, [1.0, 0.0], 1),
            (1, [1.0, 0.25], 1),
            (2, [1.0, -0.25], 1),
            (3, [0.0, 1.0], 2),
            (4, [0.25, 1.0], 2),
        ],
    )
    rows = [
        tuple(r) for r in knn_label_noise_audit(spark, str(tmp_path)).collect()
    ]
    assert rows == [(1, 3, 6, 400), (2, 2, 2, 200)]
    assert _duck_emb(e).sql(_KNN_AUDIT_ORACLE).fetchall() == rows


def test_knn_audit_empty_corpus(spark, tmp_path):
    from mapreduce_sm_spark.operators.similarity import (
        _KNN_AUDIT_ORACLE,
        knn_label_noise_audit,
    )

    e = _write_embeddings(spark, tmp_path, [])
    assert knn_label_noise_audit(spark, str(tmp_path)).collect() == []
    assert _duck_emb(e).sql(_KNN_AUDIT_ORACLE).fetchall() == []


# --- label_centroid_drift (wave 3) ----------------------------------------------


def test_centroid_drift_hand_computed_signed_floor(spark, tmp_path):
    """Exercises the SIGNED floor division: label 2's dim-1 sum is
    negative (-250), and mu = floor(1000*s/n) must floor toward -inf
    identically in both engines. Micro-grid means: label1 (750000, 0),
    label2 (-250000, 1000000), global (416666, 333333) — diffs and
    their squares are hand-traced in full."""
    from mapreduce_sm_spark.operators.similarity import (
        _CENTROID_DRIFT_ORACLE,
        label_centroid_drift,
    )

    e = _write_embeddings(
        spark,
        tmp_path,
        [
            (0, [1.0, 0.0], 1),
            (1, [0.5, 0.0], 1),
            (2, [-0.25, 1.0], 2),
        ],
    )
    rows = [
        tuple(r) for r in label_centroid_drift(spark, str(tmp_path)).collect()
    ]
    assert rows == [
        (1, 2, 333334**2 + 333333**2, 1, 333334),
        (2, 1, 666666**2 + 666667**2, 2, 666667),
    ]
    assert _duck_emb(e).sql(_CENTROID_DRIFT_ORACLE).fetchall() == rows


def test_centroid_drift_single_label_is_zero(spark, tmp_path):
    """One label == global population -> every diff is 0 (floor of the
    same rational on both sides), drift_sq 0, top_dim tie-broken to 1."""
    from mapreduce_sm_spark.operators.similarity import (
        _CENTROID_DRIFT_ORACLE,
        label_centroid_drift,
    )

    e = _write_embeddings(
        spark,
        tmp_path,
        [(0, [0.3, -0.7], 5), (1, [0.1, 0.2], 5)],
    )
    rows = [
        tuple(r) for r in label_centroid_drift(spark, str(tmp_path)).collect()
    ]
    assert rows == [(5, 2, 0, 1, 0)]
    assert _duck_emb(e).sql(_CENTROID_DRIFT_ORACLE).fetchall() == rows


def test_centroid_drift_empty_corpus(spark, tmp_path):
    from mapreduce_sm_spark.operators.similarity import (
        _CENTROID_DRIFT_ORACLE,
        label_centroid_drift,
    )

    e = _write_embeddings(spark, tmp_path, [])
    assert label_centroid_drift(spark, str(tmp_path)).collect() == []
    assert _duck_emb(e).sql(_CENTROID_DRIFT_ORACLE).fetchall() == []


# --- cluster_aware_split_audit (wave 3) -----------------------------------------


def test_cluster_split_planted_cross_pair(spark, tmp_path):
    """Plant a near-dup pair whose doc_ids land on OPPOSITE sides of the
    naive 10% test carve-out (ids chosen via hash60_py so one is test,
    one train): the naive policy leaks that pair (naive_cross_pairs 1),
    the cluster policy moves both to the min-id member's split
    (cluster_cross_pairs 0, recomputed not asserted). A third unrelated
    doc pairs with nothing."""
    from mapreduce_sm_spark.functions.hashing import hash60_py
    from mapreduce_sm_spark.operators.dedup import (
        _CLSPLIT_ORACLE,
        cluster_aware_split_audit,
    )

    def is_test(i):
        return hash60_py(str(i), "clsplit") % 10 < 1

    test_id = next(i for i in range(1000) if is_test(i))
    train_id = next(i for i in range(1000) if not is_test(i))
    dup = "the very same near duplicate text repeated verbatim here"
    d = _write_docs5(
        spark,
        tmp_path,
        [
            (test_id, dup, "en", "s", len(dup)),
            (train_id, dup, "en", "s", len(dup)),
            (999, "utterly different content with disjoint vocabulary "
                  "zebra quartz fjord glyph vex", "en", "s", 80),
        ],
    )
    rows = [
        tuple(r)
        for r in cluster_aware_split_audit(spark, str(tmp_path)).collect()
    ]
    comp_test = is_test(min(test_id, train_id))
    expected_cluster_tests = 2 * comp_test + is_test(999)
    assert rows == [
        (
            3,
            1 + is_test(999),
            expected_cluster_tests,
            1,
            1,
            0,
        )
    ]
    assert _duck(d).sql(_CLSPLIT_ORACLE).fetchall() == rows


def test_cluster_split_empty_corpus(spark, tmp_path):
    from mapreduce_sm_spark.operators.dedup import (
        _CLSPLIT_ORACLE,
        cluster_aware_split_audit,
    )

    d = _write_docs5(spark, tmp_path, [])
    rows = [
        tuple(r)
        for r in cluster_aware_split_audit(spark, str(tmp_path)).collect()
    ]
    assert rows == [(0, 0, 0, 0, 0, 0)]
    assert _duck(d).sql(_CLSPLIT_ORACLE).fetchall() == rows


# --- token_budget_allocation (wave 3) -------------------------------------------


def test_token_budget_waterfill_hand_traced(spark, tmp_path):
    """Full hand trace with a CAPPED source, the case the near-uniform
    fixture never exercises. sZ: 0 tokens -> zero row, capped at 0.
    sA: 1 token (w=100, cap=4): predicate 4*1100 <= 202*100 -> capped,
    4 epochs. sB: 100 tokens (w=1000, cap=400): 400*1000 <= 198*1000
    fails -> uncapped, alloc = floor(1000*198/1000) = 198 -> 1980 pm
    (the cap redistribution: sB absorbs what sA could not take)."""
    from mapreduce_sm_spark.operators.sampling import (
        _TB_ORACLE,
        token_budget_allocation,
    )

    d = _write_docs(
        spark,
        tmp_path,
        [
            (1, "sZ", "123", 3),
            (2, "sA", "a", 1),
            (3, "sB", " ".join(["w"] * 100), 199),
        ],
    )
    rows = [
        tuple(r) for r in token_budget_allocation(spark, str(tmp_path)).collect()
    ]
    assert rows == [
        ("sA", 1, 100, 4, 4, 4000, True),
        ("sB", 100, 1000, 400, 198, 1980, False),
        ("sZ", 0, 0, 0, 0, 0, True),
    ]
    assert _duck(d).sql(_TB_ORACLE).fetchall() == rows


def test_token_budget_allocation_never_exceeds_budget_or_caps(spark):
    """Conservation laws on the real fixture: every alloc <= cap,
    sum(alloc) <= B = 2 * sum(n_tokens), and uncapped rows sit at the
    shared water level (alloc*den floor-consistent)."""
    from tests.conftest import SF_DIR

    from mapreduce_sm_spark.operators.sampling import token_budget_allocation

    rows = token_budget_allocation(spark, SF_DIR).collect()
    assert rows
    total = sum(r["n_tokens"] for r in rows)
    assert all(r["alloc"] <= r["cap"] for r in rows)
    assert sum(r["alloc"] for r in rows) <= 2 * total
    assert all(0 <= r["epochs_pm"] <= 4000 for r in rows)


def test_token_budget_allocation_empty_corpus(spark, tmp_path):
    from mapreduce_sm_spark.operators.sampling import (
        _TB_ORACLE,
        token_budget_allocation,
    )

    d = _write_docs(spark, tmp_path, [])
    assert token_budget_allocation(spark, str(tmp_path)).collect() == []
    assert _duck(d).sql(_TB_ORACLE).fetchall() == []
