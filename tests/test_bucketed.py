"""Bucketed co-located joins: the pay-the-shuffle-once-at-ingest story."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rustic_witcher_spark.sinks.bucketed import read_table, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(orders, "b_orders", ["o_orderkey"], n_buckets=4, sort_cols=["o_orderkey"])
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", ["o_orderkey"], n_buckets=4, sort_cols=["o_orderkey"],
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    """Joining two tables bucketed on the join key must not shuffle
    either side — the whole point of paying the bucketing at ingest."""
    o, l = bucketed_tables
    joined = (
        read_table(spark, o)
        .join(read_table(spark, l), "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the only exchange allowed is the final tiny groupBy on o_orderstatus
    join_section = plan.split("HashAggregate")[-1]  # below the agg: the join subtree
    assert "Exchange hashpartitioning(o_orderkey" not in plan, plan[:2000]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
    assert joined.count() > 0


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    o, l = bucketed_tables
    got = (
        read_table(spark, o).join(read_table(spark, l), "o_orderkey")
        .agg(F.count("*").alias("n"), F.sum(F.col("l_quantity")).alias("q")).collect()[0]
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed("l_orderkey", "o_orderkey")
    want = orders.join(li, "o_orderkey").agg(F.count("*").alias("n"), F.sum(F.col("l_quantity")).alias("q")).collect()[0]
    assert (got["n"], float(got["q"])) == (want["n"], float(want["q"]))
