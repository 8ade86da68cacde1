from __future__ import annotations

import os
from pathlib import Path

import duckdb
import pytest

from rustic_witcher_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # small & fast for unit tests
    s = get_spark("rustic_witcher_spark-tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = Path(SF_DIR) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def spark_rows(df, sort_cols=None):
    """Collect a Spark DataFrame to a sorted list of plain tuples."""
    rows = [tuple(r) for r in df.collect()]
    return sorted(rows, key=lambda t: tuple(str(x) for x in t))


def duck_rows(con, sql):
    rows = [tuple(r) for r in con.execute(sql).fetchall()]
    return sorted(rows, key=lambda t: tuple(str(x) for x in t))


def assert_same(spark_df, con, sql, approx_cols=()):
    """Order-insensitive equality of a Spark result vs a DuckDB query."""
    s = spark_rows(spark_df)
    d = duck_rows(con, sql)
    assert len(s) == len(d), f"row count: spark={len(s)} duckdb={len(d)}"
    for sr, dr in zip(s, d):
        assert len(sr) == len(dr), f"arity: {sr} vs {dr}"
        for i, (sv, dv) in enumerate(zip(sr, dr)):
            if isinstance(sv, float) and isinstance(dv, float):
                assert abs(sv - dv) < 1e-6, f"col {i}: {sv} != {dv} in {sr} vs {dr}"
            else:
                assert str(sv) == str(dv), f"col {i}: {sv!r} != {dv!r} in {sr} vs {dr}"
