#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs queries()[name] on Spark and oracle_sql()[name] on DuckDB over the
same sf dir, compares row counts, column names, and sorted values
(columns ordered by name, floats rounded) — the same comparison shape
the driver uses for CORRECTNESS_r{N}.json.

Usage::

    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(df):
    """pandas frame -> sorted list of tuples, columns sorted by name."""
    cols = sorted(df.columns)
    out = df[cols].copy()
    for c in cols:
        if out[c].dtype.kind == "f":
            out[c] = out[c].round(6)
    rows = [tuple(r) for r in out.itertuples(index=False, name=None)]
    return cols, sorted(rows, key=repr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as E
    from searchengine_spark import get_spark

    spark = get_spark(cores=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )
    qs, osql = E.queries(), E.oracle_sql()
    names = args.names or list(qs)
    failures = 0
    for name in names:
        if name not in qs:
            print(f"{name}: UNKNOWN query")
            failures += 1
            continue
        t0 = time.time()
        try:
            sp = qs[name](spark, args.sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {e}")
            failures += 1
            continue
        t_spark = time.time() - t0
        if name not in osql:
            print(f"{name}: rows-only ({len(sp)} rows, {t_spark:.2f}s)")
            continue
        try:
            ora = con.sql(osql[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {str(e)[:200]}")
            failures += 1
            continue
        sc, sv = _norm(sp)
        oc, ov = _norm(ora)
        ok_cols = sc == oc
        ok_rows = len(sv) == len(ov)
        ok_vals = sv == ov
        status = "OK" if (ok_cols and ok_rows and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name}: {status} spark={len(sv)} oracle={len(ov)} "
            f"cols={'=' if ok_cols else f'{sc} vs {oc}'} "
            f"vals={'=' if ok_vals else 'DIFFER'} ({t_spark:.2f}s)"
        )
        if not ok_vals and ok_cols and ok_rows:
            diff = [(a, b) for a, b in zip(sv, ov) if a != b][:3]
            for a, b in diff:
                print(f"    spark={a}\n    oracle={b}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
