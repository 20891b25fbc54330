#!/usr/bin/env python
"""Paired-window scaling analysis over a recorded scaling_runs*.json.

Why this exists: the headline estimator (min-of-N wall per level,
then the ratio) decorrelates the two levels' host conditions.  On this
burst-credited guest that is a one-way bias: 1-2-process jobs catch
turbo-credit windows (measured 1.5x their own sustained per-core rate)
far more often than 8-process jobs, so as repeats accumulate the
2-core minimum drifts DOWN toward its turbo floor while the 8-core
minimum stays at the rationed ceiling — every additional repeat can
only lower the reported efficiency, regardless of how the engine
scales.  A real cluster comparison has no such asymmetry: N and 4N
executors run on identical per-core hardware.

The paired estimator restores that property in local mode: the bench
interleaves lo,hi children, so each adjacent (lo, hi) pair ran within
the same few-minute host window under near-shared conditions (each
child also carries its own pre-launch probe).  Efficiency is computed
WITHIN each pair, and the distribution of pair efficiencies is
reported (best / median / all, with both probes per pair).  This is
supplementary evidence printed alongside — never instead of — the
min-of-N headline.

Usage::

    python tools/scaling_pairs.py BENCH/scaling_runs_100k_supplementary.json
"""

from __future__ import annotations

import json
import statistics
import sys


def pair_table(runs: list[dict], lo: int, hi: int) -> list[dict]:
    """Adjacent (lo, hi) pairs in recorded order -> per-pair efficiency.

    The bench appends runs in launch order (lo, hi, lo, hi, ...); prior
    sessions' merged records keep their own order, so pairing adjacent
    lo->hi entries reconstructs the interleaved windows.
    """
    pairs = []
    i = 0
    while i + 1 < len(runs):
        a, b = runs[i], runs[i + 1]
        if a["cores"] == lo and b["cores"] == hi:
            eff = (a["build_sec"] / b["build_sec"]) / (hi / lo)
            pairs.append(
                {
                    "t_lo": a["build_sec"],
                    "t_hi": b["build_sec"],
                    "probe_lo": a.get("probe_ratio_before"),
                    "probe_hi": b.get("probe_ratio_before"),
                    "per_core_lo": round(a["n_files"] / a["build_sec"] / lo, 1),
                    "per_core_hi": round(b["n_files"] / b["build_sec"] / hi, 1),
                    "efficiency": round(eff, 3),
                }
            )
            i += 2
        else:
            i += 1
    return pairs


def main() -> None:
    path = sys.argv[1]
    with open(path) as f:
        rec = json.load(f)
    lo, hi = rec["lo"], rec["hi"]
    pairs = pair_table(rec["runs"], lo, hi)
    if not pairs:
        print("no adjacent (lo, hi) pairs in record")
        return
    effs = [p["efficiency"] for p in pairs]
    print(f"{len(pairs)} interleaved (local[{lo}], local[{hi}]) pairs:")
    for p in pairs:
        print(
            f"  t_lo={p['t_lo']:7.2f}s (probe {p['probe_lo']}, "
            f"{p['per_core_lo']} files/s/core)  t_hi={p['t_hi']:7.2f}s "
            f"(probe {p['probe_hi']}, {p['per_core_hi']} files/s/core)"
            f"  -> eff {p['efficiency']:.3f}"
        )
    print(
        f"paired efficiency: best={max(effs):.3f} "
        f"median={statistics.median(effs):.3f} "
        f"min={min(effs):.3f} "
        f"(min-of-N headline: {rec.get('efficiency')})"
    )


if __name__ == "__main__":
    main()
