#!/usr/bin/env python
"""Capture `.explain("formatted")` for named queries (default: the
headline set) into OUT_DIR/<query>_<suffix>.txt — the optimization
round's before/after plan evidence (guide 1.1: plan shape first).

    python tools/explain_capture.py OUT_DIR SUFFIX [QUERY ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from mapreduce_sm_spark.registry import load_all_operators
    from mapreduce_sm_spark.session import get_spark

    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    reg = load_all_operators()
    qs = reg.all()
    if not names:
        names = [q.name for q in reg.headline()]
    spark = get_spark("explain-capture")
    for name in names:
        df = qs[name].fn(spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"{name} -> {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
