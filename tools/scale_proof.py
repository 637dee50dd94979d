#!/usr/bin/env python
"""Prove the engine beyond sf0.1: replicate the fixtures REPL-fold and
measure the same queries at both scales in one sitting.

The driver ships fixtures up to sf0.1 (17 MB). To test whether the
operator plans HOLD at the next order of magnitude — not argue it —
this tool materializes an sf0.1 x REPL dataset (default 10x ≈ "sf1")
with foreign keys kept consistent by per-table key strides, then runs a
representative query set at sf0.1 and at the replicated scale with the
bench protocol (warm trial unmeasured, noop sink, cache-cleared) and
reports the growth ratio per query.

Replication semantics (why a naive 10x copy would LIE for text ops):
- every key column gets `+ i * stride(parent_table)` so each replica is
  a disjoint, referentially-consistent copy — joins/aggregates scale
  exactly 10x in input without creating cross-replica matches;
- dimension tables (region, nation) are NOT replicated (true dimensions:
  nationkey references stay valid);
- `documents.text` is SALTED per replica (~50% new md5-derived token
  mass PREPENDED, deterministic in (doc_id, replica)) so near-dup miners
  see 10x corpora, NOT 45 artificial cross-replica duplicate pairs per
  doc — an output-size explosion that would measure result
  materialization, not engine scaling. n_chars is recomputed over the
  salted text;
- `events` user/event ids are strided (10x users, 10x density on the
  same time range — the realistic way an event stream grows);
- `embeddings` vec_ids are strided with vectors unchanged (ANN queries
  are excluded from the set here: identical replicated vectors make
  top-k ties, a fixture artifact, not a scale signal).

    python tools/scale_proof.py [REPL] [query ...]

Output: one JSON line per (query, scale) + a markdown growth table on
stderr for SCALING.md. The replicated dataset lives under
/root/repo/.scale_proof/ (gitignored, reused across runs if present).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from mapreduce_sm_spark.registry import load_all_operators  # noqa: E402
from mapreduce_sm_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
OUT_ROOT = "/root/repo/.scale_proof"

DEFAULT_QUERIES = (
    # relational core: scan-agg, join-agg, 6-table join
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q9_product_profit",
    # text / reference flagship
    "wordcount",
    # events
    "sessionize_events",
    "bitmap_distinct_users",
    # near-dup family (banded / prefix-filtered — the scale claims)
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "dedup_simhash_pairs",
    "tf_cosine_pairs_prefix",
    # graph kernels
    "graph_triangle_count",
    "pagerank_supply_graph",
    # last: quadratic-within-band candidates — the known riskiest grower
    "dedup_edit_distance",
)

# key columns per table -> the table whose stride they follow
_KEYS: dict[str, dict[str, str]] = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
_DIMS = ("region", "nation")


def _stride(spark, key_table: str) -> int:
    col = {
        "customer": ("customer", "c_custkey"),
        "supplier": ("supplier", "s_suppkey"),
        "part": ("part", "p_partkey"),
        "orders": ("orders", "o_orderkey"),
        "events": ("events", "event_id"),
        "events_user": ("events", "user_id"),
        "documents": ("documents", "doc_id"),
        "embeddings": ("embeddings", "vec_id"),
    }[key_table]
    df = spark.read.parquet(f"{BASE}/{col[0]}.parquet")
    return int(df.agg(F.max(col[1])).collect()[0][0]) + 1


def _salt_text(df: DataFrame, i: int) -> DataFrame:
    """PREPEND one md5-derived 8-char token per original word,
    deterministic in (doc_id, replica): ~half the salted doc's term mass
    and distinct shingles are replica-unique, pushing cross-replica
    Jaccard well below 0.72, TF-cosine^2 below the 0.81 gate AND below
    the prefix rung's positional-filter boundary (salt mass ratio must
    exceed ~0.11 or replica pairs survive to the verify step — measured:
    a 1-per-3-words APPENDED salt sat exactly on that boundary and blew
    the candidate set up 45 pairs/doc-group), flipping enough SimHash
    bits to clear its Hamming bands, and breaking the edit-distance
    miner's 80-char prefix (an appended salt leaves replica prefixes
    IDENTICAL and manufactures lev=0 pairs). The miners then see a 10x
    corpus, not an artificial duplicate explosion."""
    n_salt = F.greatest(
        F.lit(8), F.size(F.split(F.col("text"), " ")).cast("int")
    )
    salt = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), n_salt),
            lambda j: F.substring(
                F.md5(
                    F.concat_ws(
                        "_",
                        F.col("doc_id").cast("string"),
                        F.lit(str(i)),
                        j.cast("string"),
                    )
                ),
                1,
                8,
            ),
        ),
    )
    return df.withColumn("text", F.concat(salt, F.lit(" "), F.col("text")))


def build(spark, repl: int, out_dir: str) -> None:
    strides = {
        t: _stride(spark, t)
        for t in (
            "customer",
            "supplier",
            "part",
            "orders",
            "events",
            "events_user",
            "documents",
            "embeddings",
        )
    }
    os.makedirs(out_dir, exist_ok=True)
    for t in _DIMS:
        shutil.copy(f"{BASE}/{t}.parquet", f"{out_dir}/{t}.parquet")
    for t, keymap in _KEYS.items():
        src = spark.read.parquet(f"{BASE}/{t}.parquet")
        parts = []
        for i in range(repl):
            d = src
            for col, parent in keymap.items():
                d = d.withColumn(
                    col, (F.col(col) + F.lit(i * strides[parent])).cast("long")
                )
            if t == "documents" and i > 0:
                d = _salt_text(d, i)
            parts.append(d)
        out = parts[0]
        for d in parts[1:]:
            out = out.unionAll(d)
        if t == "documents":
            out = out.withColumn("n_chars", F.length("text").cast("long"))
        if t == "embeddings":
            # fixture dtype is int32 label / int64 vec_id; keep vec_id long
            pass
        (
            out.repartition(32)
            .write.mode("overwrite")
            .parquet(f"{out_dir}/{t}.parquet")
        )
        print(f"built {t} x{repl}", flush=True)


def run_set(spark, reg, queries, sf_dir: str, label: str) -> dict[str, float]:
    jvm_gc = spark._jvm.System.gc  # type: ignore[attr-defined]
    out: dict[str, float] = {}
    for name in queries:
        q = reg.all()[name]
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        jvm_gc()
        t0 = time.time()
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 2)
        spark.catalog.clearCache()
        jvm_gc()
        print(
            json.dumps({"query": name, "scale": label, "wall_sec": out[name]}),
            flush=True,
        )
    return out


def main() -> None:
    repl = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    queries = sys.argv[2:] or list(DEFAULT_QUERIES)
    out_dir = f"{OUT_ROOT}/x{repl}"

    reg = load_all_operators()
    spark = get_spark("scale-proof")

    if not os.path.exists(f"{out_dir}/lineitem.parquet"):
        build(spark, repl, out_dir)

    base = run_set(spark, reg, queries, BASE, "sf0.1")
    big = run_set(spark, reg, queries, out_dir, f"sf0.1x{repl}")

    print(f"\n| query | sf0.1 (s) | sf0.1 x{repl} (s) | growth |", file=sys.stderr)
    print("|---|---|---|---|", file=sys.stderr)
    for name in queries:
        g = big[name] / base[name] if base[name] else float("inf")
        print(
            f"| {name} | {base[name]} | {big[name]} | {g:.1f}x |",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
