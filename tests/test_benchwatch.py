"""Pins the bench contamination detector's accounting (benchwatch.py):
which CPU counts as FOREIGN is the whole protocol — a miscount either
flags clean sittings (the 2.6-phantom-core total-minus-tree failure
measured in r10) or waves contaminated ones through."""

from __future__ import annotations

import os


def _mk(pid, ppid, cpu):
    return pid, (ppid, float(cpu))


def test_foreign_cpu_synthetic_accounting():
    from mapreduce_sm_spark.benchwatch import foreign_cpu

    me = 100
    s0 = dict([
        _mk(1, 0, 50.0),      # init: always excluded
        _mk(2, 0, 5.0),       # kthreadd
        _mk(30, 2, 10.0),     # kworker: OUR writeback, excluded
        _mk(100, 1, 1.0),     # "me"
        _mk(101, 100, 2.0),   # my child (JVM)
        _mk(102, 101, 0.5),   # grandchild (pyspark daemon)
        _mk(500, 1, 7.0),     # foreign long-lived job
        _mk(600, 1, 3.0),     # foreign job that will EXIT mid-trial
    ])
    s1 = dict([
        _mk(1, 0, 51.0),
        _mk(2, 0, 5.5),
        _mk(30, 2, 30.0),     # kworker burned 20s on our flushes
        _mk(100, 1, 2.0),
        _mk(101, 100, 40.0),  # JVM burned 38s
        _mk(102, 101, 9.5),
        _mk(103, 102, 4.0),   # NEW pyspark worker born mid-trial: ours
        _mk(500, 1, 19.0),    # foreign burned 12s
        _mk(700, 1, 2.0),     # foreign born mid-trial: not in s0, skipped
    ])
    # only pid 500's 12 foreign seconds count
    assert foreign_cpu(s0, s1, me=me) == 12.0


def test_foreign_cpu_counter_never_negative():
    from mapreduce_sm_spark.benchwatch import foreign_cpu

    s0 = dict([_mk(1, 0, 0.0), _mk(100, 1, 0.0), _mk(500, 1, 9.0)])
    s1 = dict([_mk(1, 0, 0.0), _mk(100, 1, 0.0), _mk(500, 1, 3.0)])
    # a (theoretical) backwards counter clamps to 0, never subtracts
    assert foreign_cpu(s0, s1, me=100) == 0.0


def test_descendants_walks_live_tree():
    from mapreduce_sm_spark.benchwatch import descendants, snapshot

    snap = snapshot()
    assert snap is not None and os.getpid() in snap
    tree = descendants(snap, os.getpid())
    assert os.getpid() in tree
    # our parent is NOT in our subtree
    assert os.getppid() not in tree or os.getppid() == os.getpid()


def test_own_busy_child_is_not_foreign():
    """Burn CPU in a CHILD process: its time must be charged to our tree,
    not to the foreign column — the exact false positive the naive
    accounting produced via pyspark workers."""
    import subprocess

    from mapreduce_sm_spark.benchwatch import foreign_cpu, snapshot

    s0 = snapshot()
    subprocess.run(
        ["python3", "-c",
         "t=0\nfor i in range(4_000_000): t+=i*i\nprint(t)"],
        check=True, capture_output=True,
    )
    # NB: the child has EXITED by the time of s1 — it is in neither
    # snapshot's tree, and in s0 it never existed: contributes nothing.
    s1 = snapshot()
    assert s0 is not None and s1 is not None
    # our own burned CPU (parent+exited child) must not read as foreign;
    # allow a small epsilon for unrelated system daemons ticking over
    assert foreign_cpu(s0, s1) < 0.5


def test_foreign_cpu_counts_provable_late_starters():
    """Pins the ADVICE r10 fix: a contaminating job that starts MID-trial
    (present only in s1) counts its full lifetime CPU when its starttime
    proves it was born after s0 — and is still skipped when that proof
    is unavailable (plain-dict snapshots / an s0 read race), so a
    long-lived pid raced at s0 can never charge its lifetime CPU to one
    trial."""
    from mapreduce_sm_spark.benchwatch import Snapshot, foreign_cpu

    me = 100
    s0 = Snapshot([
        (1, (0, 50.0, 1.0)),
        (100, (1, 1.0, 900.0)),    # "me"
        (101, (100, 2.0, 901.0)),  # my child
    ])
    s0.uptime = 1000.0
    s1 = Snapshot([
        (1, (0, 50.0, 1.0)),
        (100, (1, 2.0, 900.0)),
        (101, (100, 9.0, 901.0)),
        (103, (101, 7.0, 1002.0)),  # OUR worker born mid-trial: ours
        (700, (1, 6.0, 1003.0)),    # foreign born AFTER s0: counts fully
        (800, (1, 99.0, 500.0)),    # s0 read race: born BEFORE s0, not
                                    # in s0 -> must contribute nothing
    ])
    s1.uptime = 1010.0
    assert foreign_cpu(s0, s1, me=me) == 6.0
    # without the starttime/uptime proof (plain dicts), s1-only pids are
    # skipped — the pre-fix conservative behavior
    p0 = {1: (0, 50.0), 100: (1, 1.0)}
    p1 = {1: (0, 50.0), 100: (1, 2.0), 700: (1, 6.0)}
    assert foreign_cpu(p0, p1, me=me) == 0.0


def test_foreign_cpu_detects_recycled_pid():
    """Pins the ADVICE r11 fix: a pid present at both ends whose
    starttime CHANGED was recycled mid-trial (the old process exited, a
    foreign job reused the pid). The naive delta max(0, new-old)
    undercounts — the new occupant's full lifetime CPU is in-trial, so
    it is charged like a late starter; without an in-trial starttime
    proof it still contributes nothing."""
    from mapreduce_sm_spark.benchwatch import Snapshot, foreign_cpu

    me = 100
    s0 = Snapshot([
        (1, (0, 50.0, 1.0)),
        (100, (1, 1.0, 900.0)),
        (500, (1, 9.0, 100.0)),   # old foreign occupant of pid 500
    ])
    s0.uptime = 1000.0
    s1 = Snapshot([
        (1, (0, 50.0, 1.0)),
        (100, (1, 2.0, 900.0)),
        # pid 500 RECYCLED: new starttime, burned 3s — the old delta
        # rule would read max(0, 3.0 - 9.0) = 0
        (500, (1, 3.0, 1005.0)),
    ])
    s1.uptime = 1010.0
    assert foreign_cpu(s0, s1, me=me) == 3.0
    # recycled but with a PRE-s0 starttime (clock skew / bad parse):
    # no in-trial proof -> contributes nothing
    s1b = Snapshot(s1)
    s1b[500] = (1, 3.0, 500.0)
    s1b.uptime = 1010.0
    assert foreign_cpu(s0, s1b, me=me) == 0.0
    # both-ends pid with UNCHANGED starttime still takes the delta
    s1c = Snapshot(s1)
    s1c[500] = (1, 12.5, 100.0)
    s1c.uptime = 1010.0
    assert foreign_cpu(s0, s1c, me=me) == 3.5


def test_foreign_cpu_recycled_pid_membership_is_per_occupant():
    """Pins the ADVICE r12 fix: when the OLD occupant of a reused pid was
    in OUR tree, the pid must not be blanket-skipped via the s0-tree
    union — a foreign successor's in-trial CPU is charged (membership
    judged against s1's tree), and conversely a recycled pid whose NEW
    occupant is ours stays uncharged."""
    from mapreduce_sm_spark.benchwatch import Snapshot, foreign_cpu

    me = 100
    s0 = Snapshot([
        (1, (0, 50.0, 1.0)),
        (100, (1, 1.0, 900.0)),
        (101, (100, 2.0, 901.0)),   # OUR worker, will exit mid-trial
        (500, (1, 9.0, 100.0)),     # foreign, will exit mid-trial
    ])
    s0.uptime = 1000.0
    s1 = Snapshot([
        (1, (0, 50.0, 1.0)),
        (100, (1, 2.0, 900.0)),
        # pid 101 recycled: old occupant was OURS, new occupant is a
        # FOREIGN job born in-trial — its 4s must count (the pre-fix
        # union skipped the pid entirely: silent undercount)
        (101, (1, 4.0, 1004.0)),
        # pid 500 recycled the other way: old occupant foreign, new
        # occupant is OUR worker — must contribute nothing
        (500, (100, 6.0, 1005.0)),
    ])
    s1.uptime = 1010.0
    assert foreign_cpu(s0, s1, me=me) == 4.0


def test_bench_compact_line_fits_driver_tail_and_parses():
    """Pins VERDICT r11 'What's wrong' 3: the driver records only the
    LAST 2000 chars of bench stdout and parses the final line as JSON —
    the compact line must fit with margin at the real headline-set size
    and carry the verdict-usable fields; an oversized set degrades to
    top-10 with an explicit marker instead of an unparseable tail."""
    import json

    from bench import compact_line

    times = {f"some_operator_name_{i:02d}": 1.234 for i in range(31)}
    cold = {k: 2.5 for k in times}
    contaminated: dict = {k: False for k in times}
    line = compact_line(times, cold, contaminated, True, 0.42, 0.1)
    assert len(line) <= 1900
    doc = json.loads(line)
    assert doc["value"] == round(sum(times.values()), 3)
    assert doc["contaminated_queries"] == []
    assert len(doc["queries"]) == 31 and doc["settled_start"] is True

    # pathological growth: 200 queries cannot fit — totals still survive
    big = {f"q_{'x' * 40}_{i:03d}": float(i) for i in range(200)}
    contaminated2: dict = {k: (None if i == 0 else i == 1) for i, k in enumerate(big)}
    line2 = compact_line(big, big, contaminated2, False, None, "x")
    assert len(line2) <= 1900
    doc2 = json.loads(line2)
    assert doc2["queries_truncated_to"] == 10
    assert len(doc2["queries"]) == 10
    assert doc2["value"] == round(sum(big.values()), 3)
    # flagged + unknown names both surface
    assert len(doc2["contaminated_queries"]) == 2

    # ADVICE r12: the truncated line is RE-checked against the budget —
    # absurdly long names force the degradation past top-10 (top-5 or
    # totals-only) rather than exceeding the driver tail again
    huge = {f"q_{'y' * 400}_{i:03d}": float(i) for i in range(200)}
    contaminated3: dict = {k: False for k in huge}
    line3 = compact_line(huge, huge, contaminated3, False, None, "x")
    assert len(line3) <= 1900
    doc3 = json.loads(line3)
    assert doc3["queries_truncated_to"] in (5, 0)
    assert doc3["value"] == round(sum(huge.values()), 3)
    assert doc3["n_contaminated"] == 0


def test_subreaper_keeps_orphans_in_our_tree():
    """Pins the ADVICE r11 orphan mitigation: after become_subreaper(),
    a grandchild whose parent exits reparents to US (not pid 1), so the
    snapshot's descendants(me) still contains it and its CPU can never
    be charged as foreign."""
    import subprocess
    import sys
    import time

    from mapreduce_sm_spark.benchwatch import (
        become_subreaper,
        descendants,
        snapshot,
    )

    assert become_subreaper()  # Linux CI box: prctl must succeed
    # child prints its grandchild's pid, then exits immediately —
    # orphaning the sleeping grandchild onto the nearest subreaper (us)
    out = subprocess.run(
        [sys.executable, "-c",
         "import subprocess, sys\n"
         "p = subprocess.Popen([sys.executable, '-c',"
         " 'import time; time.sleep(15)'])\n"
         "print(p.pid)"],
        check=True, capture_output=True, text=True,
    )
    orphan = int(out.stdout.strip())
    try:
        for _ in range(50):  # reparenting is immediate; snapshot races aren't
            snap = snapshot()
            assert snap is not None
            if orphan in snap and snap[orphan][0] == os.getpid():
                break
            time.sleep(0.1)
        assert orphan in descendants(snap, os.getpid())
    finally:
        try:
            os.kill(orphan, 9)
            os.waitpid(orphan, 0)  # we are its reaper now
        except OSError:
            pass
