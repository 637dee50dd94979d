#!/usr/bin/env python
"""Measured scale-growth curves for the quadratic-risk operators.

VERDICT r07 item 5: the edit-distance band blocking and the sparse-cosine
family are argued scale-safe on paper; this measures the argument. For
each (query, sf) cell it records warm wall time, total shuffle write
bytes, and the LARGEST single-task shuffle write (the straggler bound a
1000-executor run cares about), via the Spark UI REST API.

    python tools/scale_curve.py [query ...]     # default: the risk set

Output: one JSON line per (query, sf) plus a markdown table on stderr
suitable for SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from mapreduce_sm_spark.registry import load_all_operators  # noqa: E402
from mapreduce_sm_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = (
    "dedup_edit_distance",
    "tf_cosine_pairs",
    "tf_cosine_pairs_prefix",
)
SFS = ("0.001", "0.01", "0.1")


def _get(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.load(r)


def _stage_ids(base: str, app: str) -> set[int]:
    return {s["stageId"] for s in _get(base, f"/applications/{app}/stages")}


def _shuffle_stats(base: str, app: str, new_ids: set[int]) -> tuple[int, int]:
    """(total shuffle write bytes, max single-task shuffle write bytes)
    across the given stages."""
    total = 0
    max_task = 0
    for s in _get(base, f"/applications/{app}/stages"):
        if s["stageId"] not in new_ids or s["status"] not in ("COMPLETE",):
            continue
        total += s.get("shuffleWriteBytes", 0)
        if s.get("shuffleWriteBytes", 0) > 0:
            try:
                summ = _get(
                    base,
                    f"/applications/{app}/stages/{s['stageId']}"
                    f"/{s['attemptId']}/taskSummary?quantiles=1.0",
                )
                mx = summ.get("shuffleWriteMetrics", {}).get(
                    "writeBytes", [0]
                )[0]
                max_task = max(max_task, int(mx))
            except Exception:
                pass  # summary endpoint can 404 for tiny stages
    return total, max_task


def main() -> None:
    queries = sys.argv[1:] or list(DEFAULT_QUERIES)
    reg = load_all_operators()
    spark = get_spark("scale-curve")
    ui = spark.sparkContext.uiWebUrl
    base = f"{ui}/api/v1"
    app = _get(base, "/applications")[0]["id"]

    rows = []
    for name in queries:
        q = reg.all()[name]
        for sf in SFS:
            sf_dir = f"/root/testdata/sf{sf}"
            # warm trial (Catalyst + JIT for this shape), not measured
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
            before = _stage_ids(base, app)
            t0 = time.time()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = round(time.time() - t0, 2)
            spark.catalog.clearCache()
            new = _stage_ids(base, app) - before
            total_sh, max_task = _shuffle_stats(base, app, new)
            row = {
                "query": name,
                "sf": float(sf),
                "wall_sec": wall,
                "shuffle_write_bytes": total_sh,
                "max_task_shuffle_write_bytes": max_task,
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    # markdown for SCALING.md
    print("\n| query | sf | warm wall (s) | shuffle write | max task shuffle |",
          file=sys.stderr)
    print("|---|---|---|---|---|", file=sys.stderr)
    for r in rows:
        print(
            f"| {r['query']} | {r['sf']} | {r['wall_sec']} "
            f"| {r['shuffle_write_bytes']:,} B "
            f"| {r['max_task_shuffle_write_bytes']:,} B |",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
