"""Bucketized range join: semantics on tiny frames, oracle match, and
the plan-shape guarantee that motivates it (no nested loop)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rustic_witcher_spark.operators.range_join import range_join
from rustic_witcher_spark.queries import SQL_CAMPAIGN_WINDOWS, q_events_in_campaign_windows
from tests.conftest import assert_same


def test_range_join_numeric(spark):
    points = spark.createDataFrame([(1, 5.0), (2, 10.0), (3, 25.0)], ["pid", "x"])
    ivals = spark.createDataFrame(
        [(100, 0.0, 9.0), (200, 5.0, 15.0), (300, 30.0, 40.0)], ["iid", "s", "e"]
    )
    got = {(r["pid"], r["iid"]) for r in range_join(points, ivals, "x", "s", "e", bucket_width=7.0).collect()}
    assert got == {(1, 100), (1, 200), (2, 200)}  # 3 matches nothing; 1 in two overlaps


def test_range_join_inclusive_bounds(spark):
    points = spark.createDataFrame([(1, 5.0), (2, 9.0)], ["pid", "x"])
    ivals = spark.createDataFrame([(100, 5.0, 9.0)], ["iid", "s", "e"])
    incl = {r["pid"] for r in range_join(points, ivals, "x", "s", "e", 4.0).collect()}
    excl = {r["pid"] for r in range_join(points, ivals, "x", "s", "e", 4.0, inclusive_end=False).collect()}
    assert incl == {1, 2} and excl == {1}


def test_range_join_with_keys(spark):
    points = spark.createDataFrame([(1, "a", 5.0), (2, "b", 5.0)], ["pid", "k", "x"])
    ivals = spark.createDataFrame([(100, "a", 0.0, 10.0)], ["iid", "k", "s", "e"])
    got = {(r["pid"], r["iid"]) for r in range_join(points, ivals, "x", "s", "e", 8.0, keys=["k"]).collect()}
    assert got == {(1, 100)}  # key 'b' point excluded despite range match


def test_campaign_windows_matches_duckdb(spark, duck, sf_dir):
    assert_same(q_events_in_campaign_windows(spark, sf_dir), duck, SQL_CAMPAIGN_WINDOWS)


def test_range_join_plan_has_no_nested_loop(spark, sf_dir):
    plan = q_events_in_campaign_windows(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan
