"""Hypertable-style rollup cascade: multi-resolution time aggregates
where each coarser level re-aggregates the next finer one.

This is the TimescaleDB continuous-aggregate / druid rollup shape: at
100 TB you materialize the finest level once (one shuffle over raw
events) and every coarser level aggregates the already-tiny previous
level — never the raw data again. Only re-aggregable statistics are
kept (count, sum, min, max; avg is derived as sum/count at read time),
which is exactly why the cascade is lossless: these form a commutative
monoid over disjoint bucket unions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rollup_level(df: DataFrame, ts_col: str, width: str, keys: list[str] | None = None) -> DataFrame:
    """Aggregate raw rows (ts, value) into tumbling buckets of ``width``.

    Output: keys + bucket_start + n/sum/min/max — the re-aggregable
    summary. One shuffle on (keys, bucket)."""
    bucket = F.window(F.col(ts_col), width).start.alias("bucket_start")
    return df.groupBy(*(keys or []), bucket).agg(
        F.count("*").alias("n"),
        F.sum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def rollup_coarser(fine: DataFrame, width: str, keys: list[str] | None = None) -> DataFrame:
    """Re-aggregate a finer rollup level into coarser buckets WITHOUT
    touching raw data: counts/sums add, mins/maxes fold. Requires the
    coarse width to be a multiple of the fine width (bucket alignment)."""
    bucket = F.window(F.col("bucket_start"), width).start.alias("bucket_start")
    return fine.groupBy(*(keys or []), bucket).agg(
        F.sum("n").alias("n"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )
