"""Local stand-in for the driver's correctness gate: run every queries()
entry at sf0.01 and compare against oracle_sql() via DuckDB (row count,
schema names, order-insensitive value hash).

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(result):
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    h = hashlib.sha256()
    for col in df.columns:
        vals = df[col]
        if vals.dtype.kind == "f":
            h.update(vals.round(9).to_json().encode())
        else:
            h.update(vals.astype(str).to_json().encode())
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(
        address="local", num_cpus=8, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {str(e)[-200:]}")
            failures += 1
            continue
        ray_s = time.perf_counter() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(got)} rows, {ray_s:.1f}s) cols={sorted(got.columns)}")
            continue
        t0 = time.perf_counter()
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL raised: {str(e)[-250:]}")
            failures += 1
            continue
        sql_s = time.perf_counter() - t0
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(want.columns)}")
        if not problems and value_hash(got) != value_hash(want):
            problems.append("value hash mismatch")
            g = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
            w = want[sorted(want.columns)].sort_values(sorted(want.columns)).reset_index(drop=True)
            for c in g.columns:
                if not g[c].equals(w[c]):
                    try:
                        diff = (g[c].astype(float) - w[c].astype(float)).abs().max()
                        problems.append(f"col {c} maxdiff {diff}")
                    except Exception:
                        neq = (g[c].astype(str) != w[c].astype(str)).sum()
                        problems.append(f"col {c} {neq} diffs")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures += 1
        else:
            print(f"PASS {name} ({len(got)} rows, ray {ray_s:.1f}s, sql {sql_s:.1f}s)")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
