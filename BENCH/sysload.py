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
    """utime+stime of OUR JOB's whole process tree, rooted at the
    topmost ancestor that shares this process's session id, plus every
    tree node's cutime+cstime (reaped children).  A child alive at t0
    and reaped by t1 moves from the live sum into its parent's cutime,
    so deltas stay exact across child lifetimes.

    Session-rooted, not self-rooted: under ``spark-submit`` the Python
    driver is a CHILD of the JVM (bash -> spark-submit -> java ->
    python), so a tree rooted at os.getpid() misses the JVM and every
    pyspark.daemon worker — they sit above/beside us — and the meter
    mislabels our own Spark CPU as "external" (round 6 sweep recorded
    external_cores_avg 2.8/7.7 == the job's own core budget).  Rooting
    at the session leader captures the whole spark-submit job while
    still excluding genuine neighbors (other sessions, host steal)."""
    me = os.getpid()
    children: dict[int, list[int]] = {}
    stats: dict[int, tuple[int, int, int, int]] = {}
    ppids: dict[int, int] = {}
    sids: dict[int, int] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                raw = f.read()
        except OSError:
            continue
        # pid (comm possibly with spaces/parens) state ppid pgrp session ...
        rest = raw.rsplit(")", 1)[1].split()
        pid = int(d)
        ppid = int(rest[1])
        sid = int(rest[3])
        utime, stime, cutime, cstime = (int(x) for x in rest[11:15])
        stats[pid] = (utime, stime, cutime, cstime)
        ppids[pid] = ppid
        sids[pid] = sid
        children.setdefault(ppid, []).append(pid)
    # climb to the highest ancestor still inside our session
    root = me
    my_sid = sids.get(me)
    while True:
        parent = ppids.get(root)
        if not parent or parent == root or sids.get(parent) != my_sid:
            break
        root = parent
    total = 0
    stack = [root]
    seen = set()
    while stack:
        pid = stack.pop()
        if pid in seen or pid not in stats:
            continue
        seen.add(pid)
        u, s, cu, cs = stats[pid]
        # cutime/cstime on every node: reaped jiffies accumulate there
        # only on reap, so live-descendant sums never double-count
        total += u + s + cu + cs
        stack.extend(children.get(pid, []))
    return total


def cpu_calibration(n_threads: int | None = None) -> dict:
    """Fixed pure-CPU probe for cross-epoch comparability: sha256
    throughput single-threaded and at n_threads (hashlib releases the
    GIL on large buffers, so threads scale to real cores).

    Round 6 found a machine epoch where EVERY bench query ran a uniform
    ~1.35x slower than round 4's record while measured external CPU was
    0.4 cores and single-core speed was normal — host-level contention
    (memory bandwidth / SMT siblings) that guest CPU accounting cannot
    see.  The parallel probe is the discriminator: it drops with the
    host epoch, so a record's walls can be read against its own
    calibration instead of against another epoch's."""
    import concurrent.futures
    import hashlib

    n_threads = n_threads or (os.cpu_count() or 8)
    buf = b"\xa5" * (16 << 20)  # 16 MiB

    def work(reps: int) -> None:
        for _ in range(reps):
            hashlib.sha256(buf).digest()

    t0 = time.monotonic()
    work(8)
    t1 = (time.monotonic() - t0) or 1e-9
    single = 8 * 16 / t1
    t0 = time.monotonic()
    with concurrent.futures.ThreadPoolExecutor(n_threads) as ex:
        list(ex.map(work, [4] * n_threads))
    tn = (time.monotonic() - t0) or 1e-9
    par = n_threads * 4 * 16 / tn
    return {
        "sha256_1t_mb_s": round(single),
        f"sha256_{n_threads}t_mb_s": round(par),
        "parallel_scaling": round(par / single / n_threads, 3),
    }


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
