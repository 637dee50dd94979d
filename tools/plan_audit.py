#!/usr/bin/env python
"""Plan audit: dump the executed (post-AQE) plan of every headline query
and summarize the scale-relevant markers — pushed filters, read schemas,
join strategies, exchange count, codegen spans. Writes PLANS.md.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from mapreduce_sm_spark.registry import load_all_operators  # noqa: E402
from mapreduce_sm_spark.session import get_spark  # noqa: E402


def _markers(plan: str) -> dict[str, object]:
    return {
        "joins": sorted(
            set(re.findall(r"(\w*HashJoin|SortMergeJoin|BroadcastNestedLoopJoin|CartesianProduct)", plan))
        ),
        "exchanges": len(re.findall(r"Exchange (hash|range)partitioning", plan)),
        "broadcasts": plan.count("BroadcastExchange"),
        "partial+final agg": plan.count("HashAggregate") >= 2,
        "take_ordered": "TakeOrderedAndProject" in plan,
        "codegen spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
    }


def _preserved_narrative() -> list[str]:
    """Everything ABOVE '## Scale findings' in the existing PLANS.md is
    hand-maintained round narrative (r05 drift rules, r07 fetch-path
    contract); regeneration must carry it forward, not drop it."""
    try:
        text = open("/root/repo/PLANS.md").read()
    except OSError:
        return []
    marker = "## Scale findings"
    if marker not in text:
        return []
    head = text.split(marker)[0].splitlines()
    # Drop ONLY the generated header (re-emitted below): the '# PLANS'
    # title, its two description lines and surrounding blanks. Anything
    # else before the first '## ' — a hand-written preamble — is
    # narrative and must survive regeneration (ADVICE r07: the old
    # pop-until-'## ' silently ate such preambles).
    if head and head[0].startswith("# PLANS"):
        head.pop(0)
        while head and (
            not head[0].strip()
            or head[0].startswith("Post-AQE physical plans at ")
            or head[0].startswith("`python tools/plan_audit.py`")
        ):
            head.pop(0)
    # trailing blanks collapse; the generator re-adds spacing
    while head and not head[-1].strip():
        head.pop()
    if head:
        head.append("")
    return head


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    registry = load_all_operators()
    spark = get_spark("plan-audit")

    out = [
        "# PLANS — executed-plan audit of the headline queries",
        "",
        f"Post-AQE physical plans at `{sf_dir}` (local[32]). Regenerate with",
        "`python tools/plan_audit.py`.",
        "",
        *_preserved_narrative(),
        "## Scale findings (would this hold at 1000x?)",
        "",
        "- **Lazy caches + AQE broadcast builds race.** AQE launches each",
        "  broadcast-exchange build as its own concurrent job; concurrent",
        "  first readers of a lazily-cached frame each recompute it",
        "  (in-flight partitions are not deduped across jobs). On the",
        "  multi-branch dedup plans this ran the shingle pipeline up to 4x",
        "  and made wall time bimodal (6-30 s). Shared cached frames are",
        "  now materialized with an explicit count() barrier before fan-out",
        "  — the same discipline a cluster job needs.",
        "- **Exchange reuse does not cover self-join aliases.** The Jaccard",
        "  prefix index fed both sides of its self-join and the whole",
        "  explode+join+collect_list subplan executed twice; it is now",
        "  cached once. At corpus scale this halves the most expensive map",
        "  stage.",
        "- **Verify joins are pinned to sort-merge.** AQE occasionally chose",
        "  to broadcast the ~1M-row candidate side of the Jaccard verify",
        "  joins; every broadcast build re-executed the candidate self-join",
        "  upstream. SMJ streams candidates once and is the only viable",
        "  strategy at 100 TB anyway (neither side fits a broadcast).",
        "- **Benchmark interference is a measurement bug, not a plan bug.**",
        "  BENCH_r03 showed shared queries regressing up to 2.2x (wordcount",
        "  1.45 s -> 3.15 s). Root cause: single-warm-run protocol plus",
        "  checkpoint blocks from the iterative queries surviving into later",
        "  queries' measurements. Under the best-of-3 + inter-trial",
        "  System.gc protocol (bench.py), every r03 regression vanished and",
        "  the shared set now beats r02 across the board (wordcount 0.68 s,",
        "  string_match 0.31 s, q1 1.15 s at sf0.1). Cold-vs-warm on",
        "  dedup_ngram_jaccard dropped from 99 s/9.1 s to 24.6 s/7.5 s",
        "  (3.3x) — the residual cold gap is HotSpot C2 compilation of the",
        "  codegen'd array loops, which amortizes over any real corpus run;",
        "  the executed plan is structurally identical cold and warm",
        "  (verified: normalized plan diff is empty).",
        "- **Iterative CC propagates only where edges exist.** Label",
        "  propagation runs on vertices with at least one near-dup edge",
        "  (a small fraction of any real corpus), four hops per checkpoint",
        "  round, one action per round; isolated docs rejoin at the end",
        "  with a single left join. The checkpoint is executor-local by",
        "  default and switches to reliable storage via",
        "  SPARKSM_CHECKPOINT_DIR (session.py::checkpoint_df). Measured at",
        "  sf0.1: the pair graph (370k edges) converges in 2 rounds with a",
        "  diameter-7 tail chain; a hop+path-halving variant (O(log d)",
        "  rounds) was measured equal locally — stage overhead dominates at",
        "  this scale — and the simpler diameter-bounded form kept.",
        "- **fan_out never converts to an RDD.** Scan width is estimated",
        "  from file sizes replaying Spark's FilePartition arithmetic,",
        "  memoized per file set; remote stores fall back to file count.",
        "",
    ]
    for q in registry.headline():
        df = q.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # force final AQE plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        formatted = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        pushed = sorted(
            set(
                m.strip().rstrip(",]")
                for m in re.findall(r"PushedFilters: \[([^\]]*)\]", formatted)
                for m in m.split(",")
                if m.strip()
            )
        )[:8]
        marks = _markers(plan)
        out.append(f"## {q.name}")
        out.append("")
        out.append(f"{q.description}")
        out.append("")
        out.append("| marker | value |")
        out.append("|---|---|")
        for k, v in marks.items():
            out.append(f"| {k} | {v} |")
        out.append(f"| pushed filters | {'; '.join(pushed) if pushed else '-'} |")
        out.append("")
        out.append("<details><summary>full plan</summary>")
        out.append("")
        out.append("```")
        out.append(plan.strip()[:4000])
        out.append("```")
        out.append("</details>")
        out.append("")

    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md written ({len(registry.headline())} queries)")


if __name__ == "__main__":
    main()
