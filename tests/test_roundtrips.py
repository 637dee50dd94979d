"""Scalar serialization round trips on hostile values — the fixture data
is too polite to exercise quoting, so these frames carry the separators,
quotes, newlines, and unicode that actually break CSV/XML codecs."""

from __future__ import annotations

from pyspark.sql import functions as F

HOSTILE = [
    (1, "plain", 10.25),
    (2, "comma, inside", -3.50),
    (3, 'quoted "name" here', 0.00),
    (4, "line\nbreak", 99999999.99),
    (5, "tab\tand;semicolon", -0.01),
    (6, "ünïcødé — em-dash", 1.23),
    (8, 'trailing backslash \\ and ""', 7.77),
]


def test_csv_roundtrip_survives_hostile_strings(spark):
    df = spark.createDataFrame(HOSTILE, "id long, name string, bal double")
    back = (
        df.select(F.to_csv(F.struct("id", "name", "bal")).alias("line"))
        .select(
            F.from_csv("line", "id long, name string, bal double").alias("s")
        )
        .select("s.*")
    )
    got = sorted(tuple(r) for r in back.collect())
    assert got == sorted(HOSTILE)


def test_csv_roundtrip_empty_string_becomes_null(spark):
    # Pinned Spark CSV semantics, not a bug to paper over: an empty
    # string serializes to "" but parses back as NULL (from_csv's
    # default emptyValue handling). Any pipeline round-tripping
    # nullable text through CSV must treat '' and NULL as one value —
    # the registered csv_roundtrip_stats only aggregates non-string
    # measures, so it is immune.
    df = spark.createDataFrame([(7, "", 2.0)], "id long, name string, bal double")
    back = (
        df.select(F.to_csv(F.struct("id", "name", "bal")).alias("line"))
        .select(
            F.from_csv("line", "id long, name string, bal double").alias("s")
        )
        .select("s.*")
    )
    assert [tuple(r) for r in back.collect()] == [(7, None, 2.0)]


def test_xml_roundtrip_survives_hostile_strings(spark):
    # XML adds entity escaping (&, <, >) to the hazard list
    rows = HOSTILE + [(9, "<tag> & &amp; </tag>", 5.55)]
    df = spark.createDataFrame(rows, "id long, name string, bal double")
    back = (
        df.select(F.to_xml(F.struct("id", "name", "bal")).alias("x"))
        .select(
            F.from_xml("x", "id long, name string, bal double").alias("s")
        )
        .select("s.*")
    )
    got = sorted(tuple(r) for r in back.collect())
    assert got == sorted(rows)


def test_shared_tmpdir_reuses_one_dir_per_prefix():
    """Pins the ADVICE r08 fix: overwrite-style detours (ORC roundtrip,
    bloom store) must reuse ONE on-disk directory per process instead of
    accumulating a copy per invocation across bench's 4 trials."""
    from mapreduce_sm_spark.session import session_tmpdir, shared_tmpdir

    a = shared_tmpdir("t_shared_")
    b = shared_tmpdir("t_shared_")
    assert a == b
    assert shared_tmpdir("t_other_") != a
    # the unshared variant still hands out fresh dirs
    assert session_tmpdir("t_fresh_") != session_tmpdir("t_fresh_")


def test_shared_tmpdir_scoped_per_sf(tmp_path):
    """Pins the ADVICE r09 fix: a persisted detour store (bloom filter, ORC
    copy) must be keyed by (prefix, sf_dir) — one shared dir across scale
    factors would let a later invocation overwrite the store a prior
    LAZY result still reads, silently swapping its data."""
    from mapreduce_sm_spark.session import shared_tmpdir

    a = shared_tmpdir("t_scoped_", "sf0.001")
    b = shared_tmpdir("t_scoped_", "sf0.01")
    assert a != b
    # same (prefix, scope) still reuses one dir
    assert shared_tmpdir("t_scoped_", "sf0.001") == a
    # scope lands in the dir name so a human can tell the stores apart
    import os

    assert "sf0.001" in os.path.basename(a)


def test_shared_tmpdir_scoped_by_full_path():
    """Pins the ADVICE r10 fix: two sf dirs with the SAME basename under
    different parents must not share a store (the key carries a hash of
    the whole path, not just the basename); trailing slashes normalize
    to the same store."""
    import os

    from mapreduce_sm_spark.session import shared_tmpdir

    a = shared_tmpdir("t_fullpath_", "/tmp/gen_a/sf0.01")
    b = shared_tmpdir("t_fullpath_", "/tmp/gen_b/sf0.01")
    assert a != b
    assert shared_tmpdir("t_fullpath_", "/tmp/gen_a/sf0.01/") == a


def test_shared_tmpdir_scope_spelling_variants_key_one_store():
    """Pins the ADVICE r11 fix: equivalent spellings of one sf_dir
    (doubled slashes, dot segments, relative vs absolute, a symlinked
    parent) must key the SAME persisted store — mixed spellings would
    otherwise silently duplicate stores and defeat reuse."""
    import os

    from mapreduce_sm_spark.session import shared_tmpdir

    a = shared_tmpdir("t_spelling_", "/tmp/gen_c/sf0.01")
    assert shared_tmpdir("t_spelling_", "/tmp/gen_c//sf0.01") == a
    assert shared_tmpdir("t_spelling_", "/tmp/gen_c/./sf0.01") == a
    assert shared_tmpdir("t_spelling_", "/tmp/gen_c/x/../sf0.01") == a
    # relative spelling of an absolute path (resolved against cwd)
    rel = os.path.relpath("/tmp/gen_c/sf0.01")
    assert shared_tmpdir("t_spelling_", rel) == a
    # a symlinked parent resolves to the real store
    os.makedirs("/tmp/gen_c/sf0.01", exist_ok=True)
    link = "/tmp/gen_c_link"
    if not os.path.islink(link):
        os.symlink("/tmp/gen_c", link)
    assert shared_tmpdir("t_spelling_", link + "/sf0.01") == a
    # scope='/' keys as a real scope, not the unscoped branch
    assert shared_tmpdir("t_spelling_", "/") != shared_tmpdir("t_spelling_")
    assert "sf0.01" in os.path.basename(a)


def test_orc_roundtrip_reuses_detour_dir(spark):
    from mapreduce_sm_spark.operators.formats import orc_roundtrip_stats
    from mapreduce_sm_spark.session import shared_tmpdir
    import os

    from tests.conftest import SF_DIR

    orc_roundtrip_stats(spark, SF_DIR).collect()
    d = os.path.join(shared_tmpdir("orc_rt_", SF_DIR), "lineitem_orc")
    before = sorted(os.listdir(d))
    orc_roundtrip_stats(spark, SF_DIR).collect()
    # same directory, overwritten in place — no second copy anywhere
    assert os.path.isdir(d)
    assert sorted(os.listdir(d)) != [] and len(os.listdir(d)) <= len(before) + 2
