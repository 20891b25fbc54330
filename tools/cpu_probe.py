#!/usr/bin/env python
"""Host CPU-scaling probe (methodology input for BENCH/BASELINE.md).

Runs an identical pure-CPU burn (numpy matmul + hashing loop, no I/O,
no shared state) in N parallel processes and reports aggregate
throughput per N.  On an unoversubscribed host, throughput scales ~N
until physical cores run out; the largest pair (lo, hi=4*lo) whose
measured ratio is >= 4.0 is the honest placement for the north_rule's
N-vs-4N evidence — beyond that, any measured inefficiency is the VM's,
not the engine's.

Usage::

    python tools/cpu_probe.py [--levels 1,2,4,8,16,32] [--secs 6]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time


def _burn(secs: float, out) -> None:
    import hashlib

    import numpy as np

    a = np.random.default_rng(0).random((96, 96))
    n = 0
    t0 = time.time()
    while time.time() - t0 < secs:
        a = a @ a
        a /= np.linalg.norm(a)
        hashlib.sha256(a.tobytes()).digest()
        n += 1
    out.put(n)


def measure(procs: int, secs: float) -> float:
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=_burn, args=(secs, q)) for _ in range(procs)]
    t0 = time.time()
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    wall = time.time() - t0
    return total / wall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="1,2,4,8,16,32")
    ap.add_argument("--secs", type=float, default=6.0)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    best: dict[int, float] = {}
    for _ in range(args.repeats):
        for n in levels:
            thr = measure(n, args.secs)
            best[n] = max(best.get(n, 0.0), thr)
    base = best[levels[0]]
    report = {
        "iters_per_sec": {str(n): round(t, 1) for n, t in best.items()},
        "speedup_vs_first": {str(n): round(best[n] / base, 2) for n in levels},
        "pair_ratios": {
            f"{lo}->{lo*4}": round(best[lo * 4] / best[lo], 2)
            for lo in levels
            if lo * 4 in best
        },
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
