"""README/runtime drift guard: every query name the README's §2 coverage
tables claim must actually be registered (round-1 lesson — tpch_extra.py
shipped 12 documented-but-unregistered queries)."""

from __future__ import annotations

import re
from pathlib import Path

from mapreduce_sm_spark.registry import load_all_operators

README = Path(__file__).resolve().parent.parent / "README.md"

# backticked snake_case identifiers in README table rows that are NOT query
# names (module attrs, helpers)
_NON_QUERY = {
    "write_formatted_text",
    "fan_out",
    "hash60",
    "oracle_sql",
    "mapreduce_opts",
    "pandas_udf",
    "read_text",
    "ann_ivf_topk",  # library helper; registered surface is ann_ivf_recall_check
}


def test_readme_query_lists_are_registered():
    registered = set(load_all_operators().queries())
    claimed = set()
    for line in README.read_text().splitlines():
        if not line.startswith("|"):
            continue
        for tok in re.findall(r"`([a-z][a-z0-9_]+)`", line):
            if "_" in tok and tok not in _NON_QUERY:
                claimed.add(tok)
    assert claimed, "README parse produced no names — parser broke"
    missing = claimed - registered
    assert not missing, f"README claims unregistered queries: {sorted(missing)}"
