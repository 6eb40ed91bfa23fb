"""Static (no-Ray) audit of the driver contract — runs in seconds.

Checks, without initialising Ray or executing any pipeline:
  1. every ``networkit_ray`` module imports cleanly;
  2. ``queries()`` exposes EXACTLY 50 slots (the driver checks the first
     50) and ``oracle_sql()`` keys are a subset of them;
  3. the rows-only remainder matches the declared non-SQL set;
  4. every oracle SQL string parses and plans in DuckDB against the real
     sf parquet views (EXPLAIN only — no execution), so a typo in an
     oracle is caught before the driver burns a full correctness run.

Usage: python tools/registry_check.py [sf_dir]   (default sf0.001)
Exit status is non-zero on any failure; intended for CI / pre-commit.
"""

from __future__ import annotations

import importlib
import os
import pkgutil
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# The five genuinely non-SQL-expressible pipelines (rows-only driver check;
# value oracles live in tests/ — see FIXTURES.md §3 and SURVEY.md §2).
DECLARED_ROWS_ONLY = {
    "minhash_dedup_groups",
    "simhash_near_dups",
    "fingerprints",
    "corpus_extract_edges",
    "corpus_pagerank",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    failures: list[str] = []

    import networkit_ray

    for mod in pkgutil.walk_packages(networkit_ray.__path__, "networkit_ray."):
        try:
            importlib.import_module(mod.name)
        except Exception as exc:  # noqa: BLE001 — report, don't abort
            failures.append(f"import {mod.name}: {exc!r}")

    import __ray_entry__ as entry

    q = entry.queries()
    o = entry.oracle_sql()
    if len(q) != 50:
        failures.append(f"queries() has {len(q)} slots, driver expects 50")
    extra = sorted(set(o) - set(q))
    if extra:
        failures.append(f"oracle_sql() keys missing from queries(): {extra}")
    rows_only = set(q) - set(o)
    if rows_only != DECLARED_ROWS_ONLY:
        failures.append(
            "rows-only drift: "
            f"undeclared={sorted(rows_only - DECLARED_ROWS_ONLY)} "
            f"stale={sorted(DECLARED_ROWS_ONLY - rows_only)}"
        )

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
        else:
            failures.append(f"missing table for views: {path}")
    for name, sql in sorted(o.items()):
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:  # noqa: BLE001
            failures.append(f"oracle {name} does not plan: {exc}")

    if failures:
        print(f"registry_check: {len(failures)} FAILURE(S)")
        for f in failures:
            print(f"  - {f}")
        return 1
    print(
        f"registry_check: OK — {len(q)} slots, {len(o)} SQL oracles plan "
        f"in DuckDB, {len(rows_only)} declared rows-only, all modules import"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
