"""External-CPU telemetry for benchmark adjudication.

The shared sandbox gets multi-minute neighbor CPU bursts that arrive
MID-RUN, and the 1-min loadavg is a bad witness on both ends: it decays
slowly after our own 32-core bursts and it counts D-state (disk-wait)
tasks, so it reads 6-9 on a machine whose CPUs are actually idle.

The direct measurement: total non-idle jiffies from /proc/stat minus
the jiffies of OUR OWN process tree (python driver + Spark JVM + Arrow
workers), over the attempt window.  The difference is the CPU the
neighbors actually burned while we measured — no decay lag, no
self-contamination.  Calibrated on idle windows at 0.25-0.9 cores
ambient while loadavg read 6-9 (round 6).
"""

from __future__ import annotations

import os
import time


def total_busy_jiffies() -> int:
    """Aggregate non-idle jiffies across all CPUs (user+nice+system+
    irq+softirq+steal+guest) from /proc/stat line 1."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    # fields: user nice system idle iowait irq softirq steal guest gnice
    return sum(vals) - vals[3] - (vals[4] if len(vals) > 4 else 0)


def proc_tree_jiffies() -> int:
    """utime+stime of this process and every live descendant, plus this
    process's cutime+cstime (reaped children).  A child alive at t0 and
    reaped by t1 moves from the live sum into cutime, so deltas stay
    exact across child lifetimes."""
    me = os.getpid()
    children: dict[int, list[int]] = {}
    stats: dict[int, tuple[int, int, int, int]] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                raw = f.read()
        except OSError:
            continue
        # pid (comm possibly with spaces/parens) state ppid ...
        rest = raw.rsplit(")", 1)[1].split()
        pid = int(d)
        ppid = int(rest[1])
        utime, stime, cutime, cstime = (int(x) for x in rest[11:15])
        stats[pid] = (utime, stime, cutime, cstime)
        children.setdefault(ppid, []).append(pid)
    total = 0
    stack = [me]
    seen = set()
    while stack:
        pid = stack.pop()
        if pid in seen or pid not in stats:
            continue
        seen.add(pid)
        u, s, cu, cs = stats[pid]
        total += u + s
        if pid == me:
            total += cu + cs
        stack.extend(children.get(pid, []))
    return total


class ExternalCpuMeter:
    """Snapshot-on-enter / measure-on-exit average external cores."""

    def __enter__(self) -> "ExternalCpuMeter":
        self._hz = os.sysconf("SC_CLK_TCK")
        self._busy0 = total_busy_jiffies()
        self._tree0 = proc_tree_jiffies()
        self._t0 = time.monotonic()
        self.external_cores_avg: float | None = None
        return self

    def __exit__(self, *exc) -> None:
        elapsed = time.monotonic() - self._t0
        ext = (total_busy_jiffies() - self._busy0) - (
            proc_tree_jiffies() - self._tree0
        )
        self.external_cores_avg = round(
            max(0.0, ext) / (elapsed * self._hz), 2
        )
