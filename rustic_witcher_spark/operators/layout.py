"""Z-order (Morton-curve) data layout for multi-dimensional data
skipping.

Motivation: the reference prunes input files by name/date
(ref: file listing modes, SURVEY §2.1 S3/S4) — one-dimensional
pruning. At lake scale the analogous physical-layout tool for TWO
selective key columns is Z-ordering: interleave the bits of both keys
into one Morton value and range-partition files by it, so a predicate
on EITHER key touches a bounded band of files (each z-range bucket
spans a bounded rectangle of (x, y) space — min/max column stats per
file stay tight on both dimensions at once).

The interleave is a pure integer expression — whole-stage codegen on
the Spark side and the IDENTICAL arithmetic in ANSI SQL for the
oracle: sum over bit positions of ``((x >> i) & 1) << 2i`` and
``((y >> i) & 1) << (2i+1)``.

100 TB story: computing z is embarrassingly parallel (no shuffle); the
layout write is ONE range-repartition by z (Spark samples bounds —
``repartitionByRange`` — a single shuffle that replaces the table's
layout forever after). The profiling query in queries.py groups by
z-bucket and reports per-bucket min/max of both dimensions — the
quantitative "how tight would my file stats be" answer, with no
extra shuffle beyond the bucket groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative
    integer columns: x occupies even bit positions, y odd ones."""
    z = F.lit(0)
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z.alias("z")


def sql_z_value(x_expr: str, y_expr: str, bits: int = 8) -> str:
    """The identical Morton interleave as a DuckDB SQL expression."""
    terms = []
    for i in range(bits):
        # fully parenthesized: DuckDB (like C) binds + tighter than <<,
        # so unparenthesized shift terms would cascade into each other
        terms.append(f"(((({x_expr}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({y_expr}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def compaction_plan(
    files: DataFrame,
    path_col: str,
    size_col: str,
    target_bytes: int,
    id_col: str | None = None,
) -> DataFrame:
    """Small-files compaction planning — the other recurring lake-layout
    job beside Z-ordering: group a file listing into near-
    ``target_bytes`` rewrite groups (column ``compaction_group``).

    Reuses the packing operator's distributed concat-and-chunk prefix
    scan (operators/packing.py): group id = floor(cumulative_bytes /
    target), so every group lands within ``target ± max_file_size`` of
    the target with NO driver-side loop and no global sort — the same
    k-level block decomposition that packs token sequences handles a
    10M-file listing.

    ``id_col``: a numeric ordering for the cumulative scan. Pass a
    locality-encoding id (e.g. date-ordinal * 1e6 + seq) to keep
    groups contiguous in partition order — compacted files then stay
    prunable. Default: a DENSE 0..n-1 rank derived from the path hash
    by shard decomposition (hash into 1024 shards → parallel per-shard
    row_number windows → broadcast shard offsets), because
    pack_sequences' block scan assumes a dense-ish id space — feeding
    it raw 60-bit hashes would leave the block table un-shrunk for ~6
    recursion levels on a 10M-file listing. The only unpartitioned
    window runs over the 1024 shard counts.
    """
    from pyspark.sql import Window

    from rustic_witcher_spark.functions.hashing import hash64
    from rustic_witcher_spark.operators.packing import pack_sequences

    d = files
    fid = id_col
    if fid is None:
        fid = "__fid"
        n_shards = 1024
        d = d.withColumn("__h", hash64(F.col(path_col), 0, "compact"))
        d = d.withColumn("__shard", F.col("__h") % n_shards)
        rw = Window.partitionBy("__shard").orderBy(F.col("__h").asc(), F.col(path_col).asc())
        d = d.withColumn("__r", F.row_number().over(rw))
        counts = d.groupBy("__shard").agg(F.count(F.lit(1)).alias("__c"))
        cw = Window.orderBy("__shard").rowsBetween(Window.unboundedPreceding, -1)
        offs = counts.withColumn(
            "__off", F.coalesce(F.sum("__c").over(cw), F.lit(0))
        ).select("__shard", "__off")
        d = d.join(F.broadcast(offs), "__shard").withColumn(
            fid, F.col("__off") + F.col("__r") - 1
        )
    out = pack_sequences(d, fid, size_col, target_bytes)
    out = out.withColumnRenamed("seq_id", "compaction_group").drop("start_offset")
    return out.drop("__fid", "__h", "__shard", "__r", "__off") if id_col is None else out


def zorder_layout(
    df: DataFrame, x_col: str, y_col: str, bits: int = 8, num_files: int | None = None
) -> DataFrame:
    """Attach the z value and range-repartition by it — the physical
    re-layout step (callers then write one file per partition). Kept
    separate from the profiling query so the repartition (the only
    shuffle) is opt-in. ``num_files`` pins the output file count
    (size it to target file bytes); None lets AQE pick — which on a
    small input coalesces to few/one file."""
    withz = df.withColumn("z", z_value(F.col(x_col), F.col(y_col), bits))
    if num_files is not None:
        return withz.repartitionByRange(num_files, "z")
    return withz.repartitionByRange("z")
