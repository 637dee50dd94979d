#!/usr/bin/env python
"""Dedicated pin sitting for NON-headline queries: the bench.py warm
protocol (JVM warm-up, 3 trials, noop sink, clearCache + System.gc
between trials, per-trial foreign-CPU contamination stamps) applied to
an explicit query list instead of the headline set. Used to pin
BASELINE.md bands for expensive registered queries the 2x gate cannot
otherwise see (VERDICT r14 item 3 / r15 item 3 precedent:
bpe_fertility_stats, source_overlap_matrix).

    python tools/pin_sitting.py QUERY [QUERY ...]

Output: one JSON line per query with trials + the warm pin
(best of trials 2-3, preferring clean ones).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_sm_spark.benchwatch import become_subreaper  # noqa: E402
from mapreduce_sm_spark.benchwatch import foreign_cpu, snapshot  # noqa: E402
from mapreduce_sm_spark.registry import load_all_operators  # noqa: E402
from mapreduce_sm_spark.session import get_spark  # noqa: E402

_EXT_CORES_MAX = 0.5


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: pin_sitting.py QUERY [QUERY ...]")
    registry = load_all_operators()
    qs = registry.all()
    missing = [n for n in names if n not in qs]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    become_subreaper()
    spark = get_spark("pin_sitting")
    spark.range(1000).count()
    warm = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    warm.groupBy("r_name").count().write.format("noop").mode("overwrite").save()
    jvm_gc = spark._jvm.System.gc  # type: ignore[attr-defined]

    for name in names:
        q = qs[name]
        trials: list[float] = []
        dirty: list[bool | None] = []
        for _ in range(3):
            s0 = snapshot()
            t0 = time.time()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            s1 = snapshot()
            trials.append(round(wall, 2))
            if s0 is None or s1 is None or wall <= 0:
                dirty.append(None)
            else:
                dirty.append(foreign_cpu(s0, s1) / wall > _EXT_CORES_MAX)
            spark.catalog.clearCache()
            jvm_gc()
        clean_warm = [t for t, d in zip(trials[1:], dirty[1:]) if d is False]
        pin = min(clean_warm) if clean_warm else min(trials[1:])
        print(
            json.dumps(
                {
                    "query": name,
                    "sf_dir": sf_dir,
                    "trials": trials,
                    "contaminated": dirty,
                    "warm_pin": pin,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
