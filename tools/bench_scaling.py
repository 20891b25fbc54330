#!/usr/bin/env python
"""Two-parallelism scaling harness (BASELINE.md "scaling efficiency").

The north rule requires throughput scaling efficiency >= 0.8 between a
cluster of N and one of 4N executors.  No real cluster exists in this
sandbox, so per the driver instruction the two cluster sizes are
evidenced as ``local[8]`` vs ``local[32]`` on identical input: same
corpus, same code, only the master URL differs.

One SparkContext per JVM, so each measurement runs in a fresh child
process (``--child CORES``); the parent aggregates and writes
``BENCH/BASELINE.md``.

The measured job is the full two-stage index build (scan -> Arrow
analyze UDF -> bucket-partitioned flat postings -> salted sort-merge
shuffle -> block encode).  The corpus is the deterministic synthetic
code corpus (``generate_corpus_distributed`` — executor-side
counter-based hashing, bit-identical at any parallelism), written to
parquet once OUTSIDE the timed section and sized (``--files``) so the
parallel compute dominates fixed Spark overhead.

Usage::

    python tools/bench_scaling.py [--files 200000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_corpus(spark, n_files: int) -> str:
    """Write the deterministic bench corpus to parquet; returns its path.

    Generation (executor-side, counter-based hashing — bit-identical at
    any parallelism) happens OUTSIDE the timed build, so the measurement
    is scan -> analyze -> shuffle -> encode, like production.
    """
    from searchengine_spark.sources.corpus import generate_corpus_distributed

    path = f"/tmp/scaling_corpus_{n_files}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        generate_corpus_distributed(spark, n_files).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def run_child(cores: int, n_files: int) -> None:
    from searchengine_spark import IndexConfig, get_spark
    from searchengine_spark.index.builder import build_index
    from searchengine_spark.sources.corpus import load_corpus

    spark = get_spark(app_name=f"scaling-{cores}", cores=cores)
    corpus = load_corpus(spark, make_corpus(spark, n_files))
    n_files_actual = corpus.count()  # warms the scan (untimed)
    idx_dir = f"/tmp/scaling_index_{cores}_{os.getpid()}"
    shutil.rmtree(idx_dir, ignore_errors=True)
    t0 = time.time()
    metrics = build_index(
        spark,
        corpus,
        idx_dir,
        IndexConfig(n_buckets=32, n_salts=8),
        source=f"scaling-{n_files}",
        force=True,
        store_content=False,
    )
    build_sec = time.time() - t0
    shutil.rmtree(idx_dir, ignore_errors=True)
    print(
        "CHILD_RESULT "
        + json.dumps(
            {
                "cores": cores,
                "n_files": n_files_actual,
                "build_sec": round(build_sec, 2),
                "files_per_sec": round(n_files / build_sec, 1),
                "postings": metrics["stage1"]["postings_emitted"],
                "bytes_compressed": metrics["stage2"]["bytes_compressed"],
            }
        )
    )


def run_parent(n_files: int, out_md: str) -> None:
    results = {}
    for cores in (8, 32):
        proc = subprocess.run(
            [sys.executable, __file__, "--child", str(cores),
             "--files", str(n_files)],
            capture_output=True, text=True, timeout=3000,
        )
        line = next(
            (l for l in proc.stdout.splitlines() if l.startswith("CHILD_RESULT ")),
            None,
        )
        if line is None:
            print(proc.stdout[-2000:], file=sys.stderr)
            print(proc.stderr[-4000:], file=sys.stderr)
            raise SystemExit(f"child local[{cores}] failed")
        results[cores] = json.loads(line[len("CHILD_RESULT "):])
        print(f"local[{cores}]: {results[cores]}")

    t8, t32 = results[8]["build_sec"], results[32]["build_sec"]
    eff = (t8 / t32) / 4.0
    os.makedirs(os.path.dirname(out_md), exist_ok=True)
    with open(out_md, "w") as f:
        f.write(
            f"""# BENCH/BASELINE — measured numbers

## Scaling (north_rule: efficiency >= 0.8 from N to 4N parallelism)

Two cluster sizes evidenced as local-mode parallelism levels (no real
cluster in this sandbox, per driver instruction): identical input,
identical code, only the master URL differs.  Measured job = full
two-stage index build (Arrow analyze UDF -> bucket-partitioned flat
postings -> salted sort-merge shuffle -> varint block encode) over the
deterministic synthetic code corpus (executor-side counter-hash
generation, bit-identical at any parallelism)
({results[8]["n_files"]} files, {results[8]["postings"]} postings,
{results[8]["bytes_compressed"]} compressed index bytes).

| master | files | build wall (s) | throughput (files/s) |
|---|---|---|---|
| local[8]  (N)  | {results[8]["n_files"]} | {t8} | {results[8]["files_per_sec"]} |
| local[32] (4N) | {results[32]["n_files"]} | {t32} | {results[32]["files_per_sec"]} |

**Scaling efficiency** = (T_N / T_4N) / 4 = ({t8} / {t32}) / 4 =
**{eff:.3f}** (target >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"}).

Reproduce: `python tools/bench_scaling.py --files {n_files}`.
Per-round headline latencies are in `BENCH_r{{N}}.json` (from
`bench.py`); the reference publishes no numbers to compare against
(BASELINE.md).
"""
        )
    print(f"efficiency={eff:.3f} -> {out_md}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--files", type=int, default=200_000)
    ap.add_argument("--out", default=str(Path(__file__).resolve().parent.parent / "BENCH" / "BASELINE.md"))
    args = ap.parse_args()
    if args.child is not None:
        run_child(args.child, args.files)
    else:
        run_parent(args.files, args.out)


if __name__ == "__main__":
    main()
