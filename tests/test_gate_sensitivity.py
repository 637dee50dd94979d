"""Meta-test of the correctness gate itself: the order-insensitive value
hash in tools/verify_local.py must DETECT real differences (a vacuous
comparator would make every oracle check meaningless) while staying
invariant to the things it promises to ignore (row order, column order)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from verify_local import value_hash  # noqa: E402


def test_hash_invariant_to_row_and_column_order():
    cols = ["b", "a"]
    rows = [(1, "x"), (2, "y")]
    assert value_hash(cols, rows) == value_hash(cols, list(reversed(rows)))
    # same data with columns swapped (values reordered to match)
    assert value_hash(cols, rows) == value_hash(["a", "b"], [("x", 1), ("y", 2)])


def test_hash_detects_value_changes():
    cols = ["a", "b"]
    base = value_hash(cols, [(1, 2.5), (3, 4.5)])
    assert base != value_hash(cols, [(1, 2.5), (3, 4.6)])  # value edit
    assert base != value_hash(cols, [(1, 2.5)])  # dropped row
    assert base != value_hash(cols, [(1, 2.5), (3, 4.5), (3, 4.5)])  # dup row
    assert base != value_hash(cols, [(1, 2.5), (4, 3.5)])  # swapped-ish


def test_hash_detects_last_ulp_float_drift():
    """The r03 failure class: values agreeing to 9 digits but differing in
    the last ulp MUST hash differently (the driver hashes exact values)."""
    import math

    cols = ["x"]
    v = 1.2345678901234567
    v_next = math.nextafter(v, 2.0)
    assert v != v_next
    assert value_hash(cols, [(v,)]) != value_hash(cols, [(v_next,)])


def test_hash_distinguishes_null_zero_empty():
    cols = ["x"]
    h_null = value_hash(cols, [(None,)])
    h_zero = value_hash(cols, [(0,)])
    h_empty = value_hash(cols, [("",)])
    h_nan = value_hash(cols, [(float("nan"),)])
    assert len({h_null, h_zero, h_empty, h_nan}) == 4


def test_midnight_timestamp_collapses_only_for_declared_date_cols():
    """ADVICE r07: a DATE column's midnight-datetime64 pandas artifact
    hashes equal to the date, but an UNDECLARED midnight timestamp (a
    date_trunc type drift) must NOT — the collapse follows the emitting
    engine's declared type, not the value's clock reading."""
    from datetime import date, datetime

    cols = ["d"]
    as_date = value_hash(cols, [(date(2024, 3, 1),)])
    midnight = [(datetime(2024, 3, 1, 0, 0, 0),)]
    # declared DATE: pandas artifact collapses -> equal
    assert value_hash(cols, midnight, frozenset({"d"})) == as_date
    # NOT declared: a midnight TIMESTAMP is a different value -> unequal
    assert value_hash(cols, midnight) != as_date
