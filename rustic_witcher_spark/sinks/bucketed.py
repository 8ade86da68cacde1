"""Bucketed table sink — pre-partitioning for co-located joins.

At 100 TB the dominant cost of a fact-fact join (e.g. orders ⋈
lineitem) is shuffling both sides on the join key. Writing the tables
BUCKETED on that key at ingest pays the shuffle once; every later join,
aggregation, or dedupe on the key reads co-located buckets and the
plan contains NO Exchange on either side (verified by
``test_bucketed_join_has_no_exchange``).

Spark's bucketing rides the table catalog (``saveAsTable``), not plain
parquet paths — bucket metadata lives in the metastore, which is what
lets the planner trust the layout. The reference engine has no
equivalent (per-file Rust pipeline); this is the Spark-native answer to
its per-table file layout (SURVEY §2.1) at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally sort-within-bucket)
    managed table. ``n_buckets`` should divide evenly into the cluster's
    task slots; sorting within buckets additionally removes the sort
    from later sort-merge joins."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
