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
  (c) accounted WITHOUT a both-ends blind spot: pids alive at both ends
      contribute their cpu-time delta; a pid present only in s1 whose
      recorded /proc starttime proves it was BORN after s0 was taken (a
      LATE-STARTING contaminator, ADVICE r10) contributes its full
      lifetime CPU — near-identical to its in-trial CPU by construction.
      Short-lived exited pyspark workers still contribute nothing (they
      are in `ours` or gone by s1), and an s0 read race on a long-lived
      pid cannot charge its lifetime CPU to one trial: without the
      starttime proof, an s1-only pid is skipped.

bench.py uses snapshot()/foreign_cpu() around every trial and stamps a
per-query `contaminated` flag into its JSON; tests/test_benchwatch.py
pins the accounting on synthetic snapshots and on the live process tree.
"""

from __future__ import annotations

import os

_CLK_TCK = os.sysconf("SC_CLK_TCK")


class Snapshot(dict):
    """pid -> (ppid, utime+stime sec[, start sec]) plus `uptime`: the
    boot-relative moment the snapshot was taken (None when unknown —
    e.g. the plain dicts the synthetic tests build)."""

    uptime: float | None = None


def snapshot() -> Snapshot | None:
    """One pass over /proc: pid -> (ppid, cpu seconds, start seconds)
    for every process. Returns None when /proc is unreadable (detector
    unavailable)."""
    try:
        snap = Snapshot()
        try:
            with open("/proc/uptime") as fh:
                snap.uptime = float(fh.read().split()[0])
        except (OSError, ValueError):
            snap.uptime = None
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
                int(rest[19]) / _CLK_TCK,  # starttime, boot-relative
            )
        return snap
    except OSError:
        return None


def descendants(snap: Snapshot, root: int) -> set[int]:
    """root plus every transitive child pid present in the snapshot."""
    kids: dict[int, list[int]] = {}
    for pid, ent in snap.items():
        kids.setdefault(ent[0], []).append(pid)
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
    """CPU seconds consumed between the snapshots by user-space
    processes outside `me`'s tree (default: this process). Kernel
    threads (descendants of kthreadd, pid 2) and pid 1 are excluded.
    Both-ends pids contribute their delta; s1-only pids contribute
    their full lifetime CPU iff their starttime proves they were born
    after s0 (the late-starter rule — see the module docstring)."""
    me = os.getpid() if me is None else me
    ours = descendants(s0, me) | descendants(s1, me)
    kernel = descendants(s0, 2) | descendants(s1, 2)
    t0 = getattr(s0, "uptime", None)
    total = 0.0
    for pid, ent in s1.items():
        if pid in ours or pid in kernel or pid == 1:
            continue
        if pid in s0:
            total += max(0.0, ent[1] - s0[pid][1])
        elif t0 is not None and len(ent) > 2 and ent[2] > t0:
            total += ent[1]  # provably born mid-trial: all CPU is in-trial
    return total


__all__ = ["Snapshot", "descendants", "foreign_cpu", "snapshot"]
