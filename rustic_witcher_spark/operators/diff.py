"""Table diff operator — source-vs-target verification.

The reference's CLI carries an ``only_datadiff`` switch
(ref: src/main.rs:172, backed by the public dms-cdc-operator crate's
pg_datadiff): after a snapshot lands in the target database, diff it
against the source per table. This is the Spark-native equivalent:
one full-outer join on the PK comparing content digests.

Scale shape: each side reduces to (pk, md5-of-row) BEFORE the join, so
the shuffle carries 32-byte digests, not rows; the join is one
exchange per side on the PK (AQE handles skewed keys). Row order and
partitioning never affect the digest (per-row hash, not an aggregate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NULL_SENTINEL = "\x01∅"  # cannot collide with real cell text


def row_digest(cols: list[str]) -> Column:
    """md5 over the named columns in the given (stable) order, with an
    unambiguous NULL encoding — `concat_ws` alone would make
    (NULL, 'x') collide with ('x', NULL)."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit(NULL_SENTINEL)) for c in cols]
    return F.md5(F.concat_ws("\x00", *parts))


def table_diff(
    source: DataFrame,
    target: DataFrame,
    pk: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Rows that differ between two tables, keyed by PK.

    Returns (pk..., status) where status ∈ {'missing_in_target',
    'missing_in_source', 'mismatch'}; identical rows are absent.
    ``compare_cols`` defaults to the non-PK columns both sides share
    (schema drift on one side = every row a mismatch, by design).
    """
    if compare_cols is None:
        compare_cols = sorted((set(source.columns) & set(target.columns)) - set(pk))
    s = source.select(*pk, row_digest(compare_cols).alias("__ds"))
    t = target.select(*pk, row_digest(compare_cols).alias("__dt"))
    j = s.join(t, on=pk, how="full_outer")
    status = (
        F.when(F.col("__dt").isNull(), F.lit("missing_in_target"))
        .when(F.col("__ds").isNull(), F.lit("missing_in_source"))
        .otherwise(F.lit("mismatch"))
    )
    return j.filter(F.col("__ds").isNull() | F.col("__dt").isNull() | (F.col("__ds") != F.col("__dt"))).select(
        *pk, status.alias("status")
    )


def diff_summary(source: DataFrame, target: DataFrame, pk: list[str]) -> DataFrame:
    """Counts per status — the one-line verdict a snapshot job logs."""
    return table_diff(source, target, pk).groupBy("status").agg(F.count("*").alias("n"))
