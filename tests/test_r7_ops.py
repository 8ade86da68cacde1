"""Round-7 additions: NULL-bearing-data oracle parity for the two
window entries ADVICE.md flagged (events_moving_avg, peak_concurrency),
and self-tests for the rewritten hash-faithful local gate
(scripts/compare_oracle.py) — the gate must be dtype-sensitive enough
to catch the HUGEINT→float64 class of bug that shipped q12 red in
rounds 5 and 6 (and q11 until the r7 gate caught it locally)."""

from __future__ import annotations

import importlib.util
from datetime import datetime
from pathlib import Path

import duckdb
import pandas as pd
import pytest

REPO = Path(__file__).resolve().parent.parent

_spec = importlib.util.spec_from_file_location("compare_oracle", REPO / "scripts" / "compare_oracle.py")
compare_oracle = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_spec and compare_oracle)

frame_rows = compare_oracle.frame_rows
normalize = compare_oracle.normalize


# ---------------------------------------------------------------------------
# gate self-tests
# ---------------------------------------------------------------------------


def test_gate_catches_int_vs_float_dtype():
    """The q12/q11 bug class: same values, int64 on one side, float64 on
    the other (DuckDB HUGEINT via fetchdf). The old gate normalized
    through fetchall + str and passed it; the faithful gate must fail."""
    a = pd.DataFrame({"k": ["x", "y"], "n": pd.array([11680, 12129], dtype="int64")})
    b = pd.DataFrame({"k": ["x", "y"], "n": pd.array([11680.0, 12129.0], dtype="float64")})
    assert frame_rows(a) != frame_rows(b)
    assert frame_rows(a) == [("x", "11680"), ("y", "12129")]
    assert frame_rows(b) == [("x", "11680.0"), ("y", "12129.0")]


def test_gate_is_row_order_insensitive():
    """The driver hash is order-insensitive (rows canonically sorted):
    many driver-green entries return different row orders across
    engines, so the gate must not fail on order alone."""
    a = pd.DataFrame({"k": ["x", "y"], "n": [1, 2]})
    b = pd.DataFrame({"k": ["y", "x"], "n": [2, 1]})
    assert frame_rows(a) == frame_rows(b)


def test_gate_normalize_nulls_and_arrays():
    import numpy as np

    assert normalize(None) == "NULL"
    assert normalize(float("nan")) == "NULL"
    assert normalize(np.float64("nan")) == "NULL"
    assert normalize(np.int64(5)) == "5"
    assert normalize(np.array([1, 2])) == normalize([1, 2])
    # dtype sensitivity reaches inside containers too
    assert normalize([1, 2]) != normalize([1.0, 2.0])


# ---------------------------------------------------------------------------
# NULL-bearing events: spark == oracle (not just no-crash)
# ---------------------------------------------------------------------------

EVENT_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


@pytest.fixture(scope="module")
def dirty_events_dir(spark, tmp_path_factory):
    """Small events table with NULL ts and NULL event_type rows mixed
    in — the case where Spark's NULLS FIRST vs DuckDB's NULLS LAST
    window ordering silently diverges unless entries guard NULLs."""
    rows = []
    t0 = datetime(2024, 1, 1)
    for i in range(200):
        ts = None if i % 17 == 0 else t0.replace(hour=i % 24, minute=(i * 7) % 60)
        et = None if i % 13 == 0 else ("click", "view", "purchase")[i % 3]
        rows.append((i, ts, i % 9, et, float(i % 50) / 3.0))
    d = tmp_path_factory.mktemp("dirty_events")
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize("name", ["events_moving_avg", "peak_concurrency", "rolling_distinct_users"])
def test_window_entries_null_parity(spark, dirty_events_dir, name):
    import __spark_entry__ as entrymod

    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    s_pdf = fn(spark, dirty_events_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{dirty_events_dir}/events.parquet/*.parquet')"
    )
    d_pdf = con.execute(sql).fetchdf()
    assert sorted(s_pdf.columns) == sorted(d_pdf.columns)
    assert frame_rows(s_pdf) == frame_rows(d_pdf)
    assert len(s_pdf) > 0
