"""Bucketized range join — point-in-interval matching without a
nested-loop join (SURVEY §2.4 extension; the reference has no joins).

Spark compiles a bare ``p BETWEEN s AND e`` join condition to
BroadcastNestedLoopJoin (or worse, CartesianProduct): every point row is
checked against every interval. That caps out quickly — at 100 TB the
interval side is rarely broadcastable and the cross product never
finishes.

``range_join`` turns the range predicate into an equi-join: pick a
bucket width ``w``, map each point to bucket ``floor(p/w)``, explode
each interval into the buckets it overlaps (``sequence(floor(s/w),
floor(e/w))``), hash-join on the bucket id (plus any equi keys), then
apply the exact range predicate. A point lies in exactly one bucket, so
no output dedup is needed. Cost: one shuffle on (bucket, keys); the
interval side fans out by ~(interval_width / w + 1) rows. Choose ``w``
near the typical interval width so the fan-out stays ~2×.

This is the same strategy as Databricks' range-join optimization and
the standard interval-join shape in Flink — expressed here purely with
DataFrame ops so Catalyst/AQE handle skew and sizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    keys: list[str] | None = None,
    inclusive_end: bool = True,
) -> DataFrame:
    """Inner-join point rows to every interval row containing them.

    ``point_col``/``start_col``/``end_col`` may be numeric or timestamp
    (timestamps are bucketed on epoch seconds; ``bucket_width`` is then
    in seconds). ``keys`` are additional equi-join columns present on
    both sides. Non-key column names must be disjoint between the two
    inputs; helper columns are dropped from the result.
    """
    w = float(bucket_width)
    p = points.withColumn("__pv", F.col(point_col).cast("double")).withColumn(
        "__bucket", F.floor(F.col("__pv") / w)
    )
    i = (
        intervals.withColumn("__s", F.col(start_col).cast("double"))
        .withColumn("__e", F.col(end_col).cast("double"))
        .withColumn("__bucket", F.explode(F.sequence(F.floor(F.col("__s") / w), F.floor(F.col("__e") / w))))
    )
    upper = F.col("__pv") <= F.col("__e") if inclusive_end else F.col("__pv") < F.col("__e")
    return (
        p.join(i, on=["__bucket", *(keys or [])])
        .filter((F.col("__pv") >= F.col("__s")) & upper)
        .drop("__pv", "__s", "__e", "__bucket")
    )
