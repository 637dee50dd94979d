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
      starttime proof, an s1-only pid is skipped. A pid present at BOTH
      ends whose starttime changed was recycled mid-trial (old process
      exited, a new one reused the pid): the naive delta would
      undercount, so it is treated as a late starter instead
      (ADVICE r11). Orphans of OUR tree (parent exited before s1) would
      read as foreign late starters; bench.py neutralizes that by
      calling become_subreaper() so they reparent to the bench process.

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
    Both-ends pids contribute their delta — unless their starttimes
    DISAGREE, which proves the pid was recycled by a new process since
    s0 (ADVICE r11: the delta would then undercount); a recycled or
    s1-only pid contributes its full lifetime CPU iff its starttime
    proves it was born after s0 (the late-starter rule — see the module
    docstring).

    Known limitation (ADVICE r11): a descendant of `me` spawned
    mid-trial whose intermediate parent exits before s1 is reparented to
    pid 1, looks s1-only with an in-trial starttime, and would be
    charged as foreign. The caller-side fix is become_subreaper():
    bench.py calls it at startup, so such orphans reparent to the bench
    process itself and stay inside `ours`."""
    me = os.getpid() if me is None else me
    ours0 = descendants(s0, me)
    ours1 = descendants(s1, me)
    kernel0 = descendants(s0, 2)
    kernel1 = descendants(s1, 2)
    t0 = getattr(s0, "uptime", None)
    total = 0.0
    for pid, ent in s1.items():
        if pid == 1:
            continue
        old = s0.get(pid)
        recycled = (
            old is not None
            and len(old) > 2
            and len(ent) > 2
            and old[2] != ent[2]
        )
        # Membership is decided PER-OCCUPANT (ADVICE r12): when the
        # starttimes prove the pid was recycled, the s1 entry is a NEW
        # process whose tree membership only the s1 snapshot can attest —
        # an old occupant that sat in OUR tree must not shield a foreign
        # successor from being charged. A non-recycled pid is the same
        # process at both ends, so either snapshot's membership applies
        # (the union also keeps a subreaper-adopted foreign orphan's
        # DELTA uncharged, matching pre-r12 behavior).
        if recycled or old is None:
            if pid in ours1 or pid in kernel1:
                continue
            if t0 is not None and len(ent) > 2 and ent[2] > t0:
                # provably born mid-trial (s1-only, or a recycled pid
                # whose old occupant exited): all its CPU is in-trial
                total += ent[1]
        else:
            if pid in ours0 or pid in ours1 or pid in kernel0 or pid in kernel1:
                continue
            total += max(0.0, ent[1] - old[1])
    return total


def become_subreaper() -> bool:
    """Mark the calling process a child subreaper (PR_SET_CHILD_SUBREAPER)
    so descendants whose intermediate parent exits reparent to US, not
    pid 1 — keeping mid-trial orphans of our own worker tree inside
    descendants(snap, me) instead of surfacing as foreign late starters
    (ADVICE r11). Returns False when prctl is unavailable (non-Linux);
    the detector then retains the documented orphan limitation."""
    try:
        import ctypes

        libc = ctypes.CDLL(None, use_errno=True)
        PR_SET_CHILD_SUBREAPER = 36
        return libc.prctl(PR_SET_CHILD_SUBREAPER, 1, 0, 0, 0) == 0
    except (OSError, AttributeError):
        return False


__all__ = [
    "Snapshot",
    "become_subreaper",
    "descendants",
    "foreign_cpu",
    "snapshot",
]
