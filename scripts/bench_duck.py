"""Time every oracle SQL in DuckDB on the same parquet at a given SF.

The practical performance baseline (BASELINE.md): the reference
publishes no query benchmark, so the bar is the single-node columnar
engine running the exact oracle twins on identical data.

Usage: python scripts/bench_duck.py [sf_dir]
Prints one JSON line: {"total": sec, "queries": {name: sec}}.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

import __spark_entry__ as entrymod
from scripts.compare_oracle import create_views


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duckdb.connect()
    create_views(con, sf_dir)
    oracles = entrymod.oracle_sql()
    timings: dict[str, float] = {}
    for _ in range(2):  # best-of-2, same as bench.py
        for name, sql in oracles.items():
            if not sql:
                continue
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
    print(json.dumps({"total": round(sum(timings.values()), 1), "n": len(timings), "queries": timings}))


if __name__ == "__main__":
    main()
