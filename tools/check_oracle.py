"""Replicates the driver's correctness gate locally: runs every
``queries()`` entry on Spark and its ``oracle_sql()`` in DuckDB at the
given sf dir, then compares row count, column names, and
order-insensitive values (floats rounded in-query on both sides).

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

import __spark_entry__ as entry
from searchengine_spark import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(srows)} rows in {time.time()-t0:.1f}s")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        dcols = list(ddf.columns)
        if sorted(scols) != sorted(dcols):
            failures.append(name)
            print(f"FAIL {name}: columns {sorted(scols)} != {sorted(dcols)}")
            continue
        cols = sorted(scols)
        s_norm = normalize([r.asDict() for r in srows], cols)
        d_norm = normalize(ddf.to_dict("records"), cols)
        if len(s_norm) != len(d_norm):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(s_norm)} duckdb={len(d_norm)}")
            ss, ds = set(s_norm), set(d_norm)
            print("  spark-only:", list(ss - ds)[:3])
            print("  duck-only :", list(ds - ss)[:3])
            continue
        if s_norm != d_norm:
            failures.append(name)
            diffs = [(a, b) for a, b in zip(s_norm, d_norm) if a != b]
            print(f"FAIL {name}: {len(diffs)} differing rows; first: {diffs[:2]}")
            continue
        print(f"OK   {name}: {len(s_norm)} rows in {time.time()-t0:.1f}s")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
