#!/usr/bin/env python
"""Capture NORMALIZED executed post-AQE plans for named queries.

Used for before/after plan diffs across commits (PLANS.md r08: the
graph-kernel drift audit ran this at HEAD and in a worktree of the
pre-change commit, then diffed the outputs). Normalization strips
expression ids, plan ids, file paths and statistics so two captures of
the same logical plan compare byte-equal.

    python tools/plan_snapshot.py OUT_DIR QUERY [QUERY ...]
    PYTHONPATH=/path/to/other/checkout python tools/plan_snapshot.py ...
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.environ.get("SNAPSHOT_REPO", "/root/repo"))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize(plan: str) -> str:
    plan = re.sub(r"#\d+L?", "#N", plan)
    plan = re.sub(r"plan_id=\d+", "plan_id=N", plan)
    plan = re.sub(r"\[id=#?\d+\]", "[id=N]", plan)
    plan = re.sub(r"file:[^\],\s]+", "PATH", plan)
    plan = re.sub(r"Statistics\([^)]*\)", "Stats", plan)
    plan = re.sub(r"exprId=\d+", "exprId=N", plan)
    return plan


def main() -> None:
    from mapreduce_sm_spark.registry import load_all_operators
    from mapreduce_sm_spark.session import get_spark

    out_dir, names = sys.argv[1], sys.argv[2:]
    os.makedirs(out_dir, exist_ok=True)
    reg = load_all_operators()
    spark = get_spark("plan-snapshot")
    for name in names:
        q = reg.all()[name]
        df = q.fn(spark, SF)
        df.collect()  # finalize AQE so the EXECUTED plan is captured
        plan = df._jdf.queryExecution().executedPlan().toString()
        path = os.path.join(out_dir, f"{name}.plan")
        with open(path, "w") as fh:
            fh.write(normalize(plan))
        print(f"{name} -> {path}")


if __name__ == "__main__":
    main()
