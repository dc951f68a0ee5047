"""Demonstrate (or refute) host-level throttling of SUSTAINED wide
parallel load — the mechanism hypothesized by the stage-02 probes
(probe_stage02c): during a local[8] leg the 32t sha256 epoch probe
decayed 18,613 -> 13,778 MB/s, and an identical pure-JVM op ran 3.3x
slower after a sustained stage with young-GC pause time inflating
~25x (old-gen count 0) — while the local[2] leg showed no
after-effect at all.  If the host cuts parallel capacity after
minutes of sustained wide load (thermal / hypervisor cap with
hysteresis), then any long local[8] rep self-degrades while a
local[2] rep does not, structurally capping the measurable 2v8
scaling ratio regardless of engine quality.

Method (pure Python + hashlib, releases the GIL on 16 MiB buffers —
no Spark, no disk, no GC):
  1. idle baseline: 1t throughput
  2. sustained N-thread sha256 for --dur seconds, throughput sampled
     per --win second window
  3. recovery: 1t samples for --recovery seconds
  repeated for N in (8, 2), with an idle gap between.

Decay ratio = last-window / first-window throughput at each width.
A healthy host holds ~1.0 at both; a throttling host shows <1 at 8t
and ~1.0 at 2t.

Usage: python BENCH/throttle_probe.py --dur 360 --out BENCH/throttle_probe_result.json
"""

from __future__ import annotations

import argparse
import concurrent.futures
import hashlib
import json
import os
import threading
import time
from pathlib import Path

BUF = b"\xa5" * (16 << 20)  # 16 MiB: GIL released per hash call


def one_t_mb_s(reps: int = 8) -> float:
    t0 = time.monotonic()
    for _ in range(reps):
        hashlib.sha256(BUF).digest()
    return round(reps * 16 / (time.monotonic() - t0), 1)


def sustained(n_threads: int, dur: float, win: float) -> list[dict]:
    """Run n_threads hashing continuously for dur seconds; return
    per-window aggregate MB/s."""
    stop_at = time.monotonic() + dur
    counts = [0] * n_threads
    lock = threading.Lock()  # unused; counts are per-slot

    def worker(i: int) -> None:
        while time.monotonic() < stop_at:
            hashlib.sha256(BUF).digest()
            counts[i] += 1

    windows: list[dict] = []
    with concurrent.futures.ThreadPoolExecutor(n_threads) as ex:
        futs = [ex.submit(worker, i) for i in range(n_threads)]
        t_start = time.monotonic()
        prev_total, prev_t = 0, t_start
        while time.monotonic() < stop_at:
            time.sleep(min(win, max(0.1, stop_at - time.monotonic())))
            now = time.monotonic()
            total = sum(counts)
            mb_s = (total - prev_total) * 16 / (now - prev_t)
            windows.append(
                {"t": round(now - t_start, 1), "mb_s": round(mb_s, 1)}
            )
            prev_total, prev_t = total, now
        for f in futs:
            f.result()
    return windows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dur", type=float, default=360)
    ap.add_argument("--win", type=float, default=20)
    ap.add_argument("--recovery", type=float, default=120)
    ap.add_argument("--widths", default="8,2")
    ap.add_argument("--out", default="BENCH/throttle_probe_result.json")
    args = ap.parse_args()

    result: dict = {
        "dur_s": args.dur,
        "win_s": args.win,
        "loadavg_start": os.getloadavg()[0],
        "idle_1t_mb_s": one_t_mb_s(),
        "phases": [],
    }
    for width in [int(w) for w in args.widths.split(",")]:
        windows = sustained(width, args.dur, args.win)
        rec = []
        t_rec0 = time.monotonic()
        while time.monotonic() - t_rec0 < args.recovery:
            rec.append(
                {"t": round(time.monotonic() - t_rec0, 1), "mb_s_1t": one_t_mb_s()}
            )
            time.sleep(20)
        first = windows[0]["mb_s"] if windows else None
        last = windows[-1]["mb_s"] if windows else None
        result["phases"].append(
            {
                "threads": width,
                "windows": windows,
                "first_window_mb_s": first,
                "last_window_mb_s": last,
                "decay_ratio": round(last / first, 3) if first else None,
                "min_window_mb_s": min(w["mb_s"] for w in windows) if windows else None,
                "recovery_1t": rec,
            }
        )
    result["loadavg_end"] = os.getloadavg()[0]
    Path(args.out).write_text(json.dumps(result, indent=1))
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
