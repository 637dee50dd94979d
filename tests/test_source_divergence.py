"""source_unigram_divergence: exact per-mille L2^2 mixture diagnostics.

Hand-traced fixtures pin the algebraic absent-token fold and the
deterministic tie-break the sf0.001 oracle-parity test cannot isolate."""

from __future__ import annotations

import duckdb

from mapreduce_sm_spark.operators.sampling import (
    _SRC_DIV_ORACLE,
    source_unigram_divergence,
)


def _write_docs(spark, tmp_path, rows):
    d = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        rows, "doc_id long, source string, text string, n_chars long"
    ).coalesce(1).write.parquet(d)
    return d


def test_divergence_hand_computed_with_absent_token_mass(spark, tmp_path):
    """Corpus: sA = 'x x x y', sB = 'y y y y'. Totals X=3, Y=5, t=8 ->
    corpus pm X=375, Y=625 (floor 1000ths). sA spm X=750, Y=250; sB
    spm Y=1000 with X ABSENT. Full-vocab L2^2 for BOTH sources is
    140625 + 140625 = 281250 — sB's X term (0-375)^2 enters only via
    the algebraic fold (sum_all pm^2 = 531250 minus the present-token
    correction), which is exactly what this pins. sA's top token is a
    designed TIE (|diff| = 375 for both X and Y) broken by token ASC."""
    d = _write_docs(
        spark,
        tmp_path,
        [(1, "sA", "x x x y", 7), (2, "sB", "y y y y", 7)],
    )
    got = {r["source"]: r.asDict()
           for r in source_unigram_divergence(spark, str(tmp_path)).collect()}
    assert got["sA"] == {
        "source": "sA", "n_tokens": 4, "l2sq_pm2": 281250,
        "top_token": "X", "top_diff_pm": 375,
    }
    assert got["sB"] == {
        "source": "sB", "n_tokens": 4, "l2sq_pm2": 281250,
        "top_token": "Y", "top_diff_pm": 375,
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/*.parquet'")
    oracle = {r[0]: r for r in con.sql(_SRC_DIV_ORACLE).fetchall()}
    for src, r in got.items():
        assert oracle[src] == tuple(r.values())


def test_divergence_identical_source_is_zero(spark, tmp_path):
    """A source distributionally identical to the corpus diverges by
    exactly 0 (the statistic's fixed point): two sources with the same
    histogram -> corpus histogram equals both -> every term cancels."""
    d = _write_docs(
        spark,
        tmp_path,
        [(1, "sA", "x x y", 5), (2, "sB", "x x y", 5)],
    )
    rows = source_unigram_divergence(spark, str(tmp_path)).collect()
    assert [(r["source"], r["l2sq_pm2"], r["top_diff_pm"]) for r in rows] == [
        ("sA", 0, 0),
        ("sB", 0, 0),
    ]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/*.parquet'")
    assert con.sql(_SRC_DIV_ORACLE).fetchall() == [
        tuple(r) for r in rows
    ]


def test_divergence_degenerate_corpora(spark, tmp_path):
    """Empty corpus -> empty report; all-empty-text source is absent
    from the report (no tokens, no distribution) — both engines."""
    d = _write_docs(spark, tmp_path, [])
    assert source_unigram_divergence(spark, str(tmp_path)).collect() == []
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/*.parquet'")
    assert con.sql(_SRC_DIV_ORACLE).fetchall() == []

    d2 = str(tmp_path / "e2")
    (tmp_path / "e2").mkdir()
    dd = _write_docs(
        spark, tmp_path / "e2",
        [(1, "sA", "x y", 3), (2, "sEMPTY", "", 0), (3, "sEMPTY", "   ", 3)],
    )
    rows = source_unigram_divergence(spark, d2).collect()
    assert [r["source"] for r in rows] == ["sA"]
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW documents AS SELECT * FROM '{dd}/*.parquet'")
    assert con2.sql(_SRC_DIV_ORACLE).fetchall() == [tuple(rows[0])]
