"""Foreign-CPU contamination detector for the bench protocol.

Why not load1: the bench's own 32-core bursts push the 1-minute load
average past 10 on an otherwise idle machine (measured, BENCH_LOCAL_r09),
so load1 can gate the START of a sitting but cannot flag a contaminated
trial mid-bench. The separable signal is FOREIGN user-space CPU: the sum
of per-process cpu-time deltas over processes that are
  (a) OUTSIDE this process tree (python driver + local-mode JVM +
      pyspark daemon/workers),
  (b) not kernel threads (kworkers perform OUR writeback and shuffle
      flushes; charging them to "external" showed up to 2.6 phantom
      cores on an idle box under the naive total-minus-tree accounting),
  (c) alive at BOTH ends of the trial — a genuine contaminating job
      (another Spark JVM, a test run) is long-lived, while short-lived
      exited pyspark workers would otherwise leak self-CPU into the
      foreign column.

bench.py uses snapshot()/foreign_cpu() around every trial and stamps a
per-query `contaminated` flag into its JSON; tests/test_benchwatch.py
pins the accounting on synthetic snapshots and on the live process tree.
"""

from __future__ import annotations

import os

_CLK_TCK = os.sysconf("SC_CLK_TCK")

Snapshot = dict[int, tuple[int, float]]  # pid -> (ppid, utime+stime sec)


def snapshot() -> Snapshot | None:
    """One pass over /proc: pid -> (ppid, cpu seconds) for every process.
    Returns None when /proc is unreadable (detector unavailable)."""
    try:
        snap: Snapshot = {}
        for d in os.listdir("/proc"):
            if not d.isdigit():
                continue
            try:
                with open(f"/proc/{d}/stat") as fh:
                    # comm may contain spaces/parens: split on the LAST ')'
                    rest = fh.read().rsplit(")", 1)[1].split()
            except (OSError, IndexError):
                continue  # raced a process exit
            snap[int(d)] = (
                int(rest[1]),
                (int(rest[11]) + int(rest[12])) / _CLK_TCK,
            )
        return snap
    except OSError:
        return None


def descendants(snap: Snapshot, root: int) -> set[int]:
    """root plus every transitive child pid present in the snapshot."""
    kids: dict[int, list[int]] = {}
    for pid, (ppid, _) in snap.items():
        kids.setdefault(ppid, []).append(pid)
    out: set[int] = set()
    stack = [root]
    while stack:
        pid = stack.pop()
        if pid in out:
            continue
        out.add(pid)
        stack.extend(kids.get(pid, ()))
    return out


def foreign_cpu(s0: Snapshot, s1: Snapshot, me: int | None = None) -> float:
    """CPU seconds consumed between the snapshots by live user-space
    processes outside `me`'s tree (default: this process). Kernel
    threads (descendants of kthreadd, pid 2) and pid 1 are excluded;
    processes missing from either snapshot contribute nothing."""
    me = os.getpid() if me is None else me
    ours = descendants(s0, me) | descendants(s1, me)
    kernel = descendants(s0, 2) | descendants(s1, 2)
    total = 0.0
    for pid, (_, cpu1) in s1.items():
        if pid in ours or pid in kernel or pid == 1 or pid not in s0:
            continue
        total += max(0.0, cpu1 - s0[pid][1])
    return total


__all__ = ["Snapshot", "descendants", "foreign_cpu", "snapshot"]
