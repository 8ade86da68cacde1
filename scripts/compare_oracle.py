"""Local harness mimicking the driver's correctness gate.

Runs every queries() entry at a given SF dir and compares row count,
column names, and order-insensitive values against oracle_sql() in
DuckDB. Usage: python scripts/compare_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

import __spark_entry__ as entrymod

TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]


def create_views(con, sf_dir: str) -> None:
    """Register every synthetic table present in ``sf_dir`` as a DuckDB
    view — shared with scripts/bench_duck.py."""
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")


def normalize(v):
    if isinstance(v, float):
        return f"{v:.6f}"
    return str(v)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # VANILLA session, like the driver's: queries() must not depend on the
    # engine's own session factory confs (that was round 1's 9-query bug).
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("compare-oracle")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    con = duckdb.connect()
    create_views(con, sf_dir)

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            spark_cols = sorted(df.columns)
            rows = df.collect()
            s_rows = sorted(tuple(normalize(r[c]) for c in spark_cols) for r in rows)
            if name not in oracles:
                print(f"  {name:28s} rows-only: {len(s_rows)} rows, cols={spark_cols}")
                continue
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_idx = {c: i for i, c in enumerate(d_cols)}
            duck_cols = sorted(d_cols)
            d_rows = sorted(tuple(normalize(r[d_idx[c]]) for c in duck_cols) for r in res.fetchall())
            status = []
            if spark_cols != duck_cols:
                status.append(f"COLS spark={spark_cols} duck={duck_cols}")
            if len(s_rows) != len(d_rows):
                status.append(f"COUNT spark={len(s_rows)} duck={len(d_rows)}")
            elif spark_cols == duck_cols and s_rows != d_rows:
                bad = next((i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b)
                status.append(f"VALUES first-diff@{bad[0]}: spark={bad[1]} duck={bad[2]}")
            if status:
                failures.append(name)
                print(f"✗ {name:28s} {'; '.join(status)}")
            else:
                print(f"✓ {name:28s} {len(s_rows)} rows")
        except Exception as e:
            failures.append(name)
            print(f"✗ {name:28s} ERROR {type(e).__name__}: {str(e).splitlines()[0][:160]}")
            if os.environ.get("VERBOSE"):
                traceback.print_exc()
    print(f"\n{len(qs) - len(failures)}/{len(qs)} OK; failures: {failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
