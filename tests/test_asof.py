"""As-of join: semantics on tiny frames + DuckDB ASOF JOIN oracle.

The reference has no as-of operator (SURVEY §2.4: no joins at all);
this is a north-star extension. Implementation under test is the
union+window composition in operators/asof.py — one shuffle on the
key, no range explosion.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from rustic_witcher_spark.operators.asof import asof_join
from rustic_witcher_spark.queries import SQL_ASOF, q_asof_last_purchase
from tests.conftest import assert_same


def _ts(h, m=0):
    return datetime.datetime(2026, 1, 1, h, m)


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, _ts(9)), (1, _ts(10)), (1, _ts(12)), (2, _ts(9))],
        ["k", "ts"],
    )
    right = spark.createDataFrame(
        [(1, _ts(8), 100.0), (1, _ts(10), 200.0), (1, _ts(11), 300.0), (3, _ts(1), 999.0)],
        ["k", "ts", "v"],
    )
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts", value_cols=["v"])
    got = {(r["k"], r["ts"].hour): r["v_asof"] for r in out.collect()}
    assert got[(1, 9)] == 100.0  # strictly-before match
    assert got[(1, 10)] == 200.0  # equal ts is inclusive
    assert got[(1, 12)] == 300.0  # latest of several
    assert got[(2, 9)] is None  # key with no right rows -> NULL, row kept


def test_asof_preserves_left_rowcount(spark):
    left = spark.createDataFrame([(1, _ts(9)), (1, _ts(9)), (2, _ts(9))], ["k", "ts"])
    right = spark.createDataFrame([(1, _ts(8), 1.0)], ["k", "ts", "v"])
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts", value_cols=["v"])
    assert out.count() == 3
    assert out.columns == ["k", "ts", "v_asof"]


def test_asof_tiebreak_deterministic(spark):
    # two right rows at the same ts: highest tiebreak wins... the window
    # orders __tb ASC and last() takes the final one, so max(tiebreak).
    left = spark.createDataFrame([(1, _ts(10))], ["k", "ts"])
    right = spark.createDataFrame(
        [(1, _ts(9), 10.0, 1), (1, _ts(9), 20.0, 2)],
        ["k", "ts", "v", "seq"],
    )
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts", value_cols=["v"], tiebreak="seq")
    assert out.collect()[0]["v_asof"] == 20.0


def test_asof_matches_duckdb_oracle(spark, duck, sf_dir):
    assert_same(q_asof_last_purchase(spark, sf_dir), duck, SQL_ASOF)


def test_asof_plan_single_shuffle(spark, sf_dir):
    """Scale shape: the whole as-of is ONE exchange on the join key."""
    plan = q_asof_last_purchase(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 2, plan  # right-side pre-agg + window partition


def test_asof_null_valued_right_row_masks_not_skips(spark):
    # The match is "most recent right ROW": a NULL-valued right row at
    # t=10 must yield NULL for a t=11 probe — NOT resurrect the t=8 row
    # (r9 dirty-stream fuzz finding; DuckDB's native ASOF agrees).
    left = spark.createDataFrame([(1, _ts(11))], ["k", "ts"])
    right = spark.createDataFrame(
        [(1, _ts(8), 100.0), (1, _ts(10), None)],
        "k long, ts timestamp, v double",
    )
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts", value_cols=["v"])
    assert out.collect()[0]["v_asof"] is None


def test_asof_null_ts_rows_dropped_both_sides(spark):
    # NULL ts: no as-of position. Left NULL-ts rows leave the output;
    # right NULL-ts rows are invisible to every probe.
    left = spark.createDataFrame([(1, _ts(11)), (1, None)], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, None, 999.0), (1, _ts(8), 100.0)], "k long, ts timestamp, v double"
    )
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts", value_cols=["v"]).collect()
    assert len(out) == 1 and out[0]["v_asof"] == 100.0


def test_asof_null_join_key_left_unmatched_right_invisible(spark, tmp_path):
    # NULL never equi-joins: a NULL-key right row is invisible even to
    # a NULL-key left row, which survives unmatched (DuckDB's native
    # ASOF LEFT JOIN agrees — verified in review, r9).
    import duckdb

    left = spark.createDataFrame([(None, _ts(2)), (1, _ts(2))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(None, _ts(1), 9.5), (1, _ts(1), 1.5)], "k long, ts timestamp, v double"
    )
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts", value_cols=["v"])
    got = {r["k"]: r["v_asof"] for r in out.collect()}
    assert got == {None: None, 1: 1.5}
    ld, rd = str(tmp_path / "l"), str(tmp_path / "r")
    left.write.parquet(ld)
    right.write.parquet(rd)
    con = duckdb.connect()
    want = {
        k: v
        for k, v in con.execute(
            f"""SELECT l.k, r.v FROM read_parquet('{ld}/*.parquet') l
                ASOF LEFT JOIN read_parquet('{rd}/*.parquet') r
                ON l.k = r.k AND l.ts >= r.ts"""
        ).fetchall()
    }
    assert got == want
