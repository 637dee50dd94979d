"""Z-order layout: curve math vs the pure-Python reference, and the
actual file-skipping effect of a z-ordered parquet write measured from
the written files' min/max footers (the stats a real scan prunes on)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from mapreduce_sm_spark.functions.zorder import (
    zorder_frame,
    zvalue,
    zvalue_py,
    zvalue_sql,
)


def test_zvalue_matches_python_reference(spark):
    pairs = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321),
             (255, 256), (70000, 3)]  # 70000 wraps: only low 16 bits count
    df = spark.createDataFrame(pairs, "a long, b long").select(
        "a", "b", zvalue("a", "b").alias("z")
    )
    got = {(r.a, r.b): r.z for r in df.collect()}
    for a, b in pairs:
        assert got[(a, b)] == zvalue_py(a, b), (a, b)


def test_zvalue_sql_is_engine_portable():
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT a, b, {zvalue_sql('a', 'b')} AS z FROM "
        "(SELECT unnest([0, 1, 255, 65535, 12345]) AS a, "
        "        unnest([0, 1, 256, 65535, 54321]) AS b)"
    ).fetchall()
    for a, b, z in rows:
        assert z == zvalue_py(a, b)


def test_zvalue_is_bijective_on_16bit_pairs():
    seen = set()
    for a in range(0, 1 << 16, 1021):  # stride a prime: 65 values/dim
        for b in range(0, 1 << 16, 997):
            z = zvalue_py(a, b)
            assert z not in seen
            seen.add(z)


def _files_containing(path: str, column: str, value: int) -> tuple[int, int]:
    """(files whose [min,max] stats contain value, total files)."""
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        lo = min(
            md.row_group(i).column(_col_idx(md, column)).statistics.min
            for i in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(i).column(_col_idx(md, column)).statistics.max
            for i in range(md.num_row_groups)
        )
        if lo <= value <= hi:
            hit += 1
    return hit, len(files)


def _col_idx(md, name: str) -> int:
    schema = md.schema
    for i in range(len(schema)):
        if schema.column(i).name == name:
            return i
    raise KeyError(name)


def test_zordered_write_skips_files_on_both_dimensions(spark, tmp_path):
    """A date-sorted layout leaves every file spanning the full custkey
    range (no skipping on custkey); the z-ordered layout must let a
    custkey probe skip most files while keeping date skipping useful."""
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    probe_key = 750  # mid-range customer
    n_files = 16

    naive = str(tmp_path / "naive")
    (
        orders.repartitionByRange(n_files, "o_orderdate")
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite")
        .parquet(naive)
    )
    zo = str(tmp_path / "zorder")
    day = "(unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000)"
    zorder_frame(orders, "o_custkey", day, n_files).write.mode(
        "overwrite"
    ).parquet(zo)

    naive_hits, naive_total = _files_containing(naive, "o_custkey", probe_key)
    z_hits, z_total = _files_containing(zo, "o_custkey", probe_key)
    # the date-sorted layout cannot skip on custkey: every file contains it
    assert naive_hits == naive_total
    # the z-curve layout must skip at least half the files for a point probe
    assert z_hits * 2 <= z_total, (z_hits, z_total)
    # row counts survive the relayout
    assert (
        spark.read.parquet(zo).count()
        == spark.read.parquet(naive).count()
        == orders.count()
    )
