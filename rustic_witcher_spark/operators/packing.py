"""Sequence packing for pretraining pipelines (north-star extension).

GPT-style pretraining concatenates the token stream of the whole corpus
(in a fixed document order) and slices it into fixed-size training
sequences. The operator here computes, for every document, which
training sequence its first token lands in — i.e. the bin assignment of
concat-and-chunk packing — without ever materializing the concatenated
stream.

The core is a distributed prefix sum. A naive cumulative sum is a
window over ONE global ordering — a single-partition WindowExec that
dies at scale. Instead we use the classic two-level scan:

1. group documents into fixed ``block``s of the (dense-ish) id space
   and compute per-block token sums — one map-side-combinable shuffle
   of ``n_docs / block`` rows;
2. exclusive-prefix-sum the per-block table. If that table itself
   exceeds ``scan_threshold`` rows (~1M by default — the point where a
   single unpartitioned WindowExec stops being "tiny"), the SAME
   decomposition recurses on it: super-blocks of ``block`` blocks,
   their sums, their offsets — giving a 3-, 4-, k-level scan whose
   every window is bounded by ``max(block, scan_threshold)`` rows;
3. join the block offsets back (broadcast only while the offset table
   is under the threshold) and finish with a PER-BLOCK window
   (partitioned by block id, so it parallelizes across executors).

global_cumsum(doc) = block_offset(block(doc)) + local_cumsum(doc)

The result is deterministic in the document id order, independent of
physical partitioning — the property that makes packing reproducible
across cluster sizes and re-runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


#: Max rows allowed in ONE unpartitioned prefix-sum window before the
#: scan recurses another level. ~1M rows of (bid, sum) is comfortably a
#: single-task window; the default makes the 3rd level kick in around
#: block * 1M ≈ 64M documents.
SCAN_THRESHOLD = 1 << 20


def _exclusive_prefix(
    sums: DataFrame,
    bid_col: str,
    sum_col: str,
    off_col: str,
    block: int,
    threshold: int,
    level: int = 1,
) -> DataFrame:
    """Exclusive prefix sum of ``sum_col`` over ``bid_col`` order, as
    (bid_col, off_col). Recurses the two-level decomposition whenever
    the table still exceeds ``threshold`` rows, so no single window
    ever scans more than ``max(block, threshold)`` rows regardless of
    corpus size. Each level shrinks the table ``block``× — depth is
    log_block(n_blocks), i.e. 3 levels cover ~10^13 docs at defaults.

    The level's row count is decided with a real count() on the (per-
    aggregated, hence small) table; the table is cached first so the
    decision pass is not a recompute of the upstream aggregation when
    the downstream join consumes it again.
    """
    sums = sums.persist()
    n = sums.count()
    if n <= threshold:
        w = Window.orderBy(bid_col).rowsBetween(Window.unboundedPreceding, -1)
        return sums.select(
            bid_col, F.coalesce(F.sum(sum_col).over(w), F.lit(0)).alias(off_col)
        )
    # per-level unique names: at depth ≥ 2 this function's input IS a
    # previous level's (__sbid1, __ssum1), and withColumn would
    # silently REPLACE a same-named bid column instead of adding one.
    sbid, ssum, soff_col = f"__sbid{level}", f"__ssum{level}", f"__soff{level}"
    # fan-out must be ≥ 2: with block=1 (a legal packing block size —
    # one block per id), floor(bid / 1) == bid and the table would
    # never shrink → unbounded recursion, one Spark job per level.
    fan = max(block, 2)
    sup = sums.withColumn(sbid, F.floor(F.col(bid_col) / F.lit(fan)))
    ssums = sup.groupBy(sbid).agg(F.sum(sum_col).alias(ssum))
    soff = _exclusive_prefix(ssums, sbid, ssum, soff_col, block, threshold, level + 1)
    # within each super-block: exclusive local prefix + the super-block
    # offset. Window partitioned by the super-bid → ≤ block rows per task.
    w = Window.partitionBy(sbid).orderBy(bid_col).rowsBetween(Window.unboundedPreceding, -1)
    return (
        sup.join(soff, sbid)
        .select(
            bid_col,
            (F.col(soff_col) + F.coalesce(F.sum(sum_col).over(w), F.lit(0))).alias(off_col),
        )
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    count_col: str,
    budget: int,
    block: int = 64,
    scan_threshold: int = SCAN_THRESHOLD,
) -> DataFrame:
    """Assign each row to its concat-and-chunk sequence.

    Adds columns:
      ``start_offset`` — position of the row's first token in the
        concatenated stream (0-based), ordered by ``id_col``;
      ``seq_id``       — ``start_offset // budget``, the training
        sequence the row starts in.

    The assignment depends ONLY on (ids, counts, budget) — never on
    ``block``, ``scan_threshold``, or physical partitioning (the
    block-size-invariance property test pins this).
    """
    bid = F.floor(F.col(id_col) / F.lit(block)).alias("__bid")
    d = df.withColumn("__bid", bid)

    # (1) per-block sums: partial-aggregates map-side, tiny shuffle
    bsums = d.groupBy("__bid").agg(F.sum(count_col).alias("__bsum"))

    # (2) exclusive prefix over the block table, recursing while the
    # table exceeds scan_threshold (see _exclusive_prefix)
    offsets = _exclusive_prefix(bsums, "__bid", "__bsum", "__boff", block, scan_threshold)

    # (3) per-block inclusive cumsum, parallel across blocks. Broadcast
    # the offsets only when the block table fit in one window level —
    # past the threshold it can be arbitrarily large, and the hash join
    # on __bid is the scalable path.
    if bsums.count() <= scan_threshold:
        offsets = F.broadcast(offsets)
    loc_w = Window.partitionBy("__bid").orderBy(id_col).rowsBetween(Window.unboundedPreceding, 0)
    out = (
        d.join(offsets, "__bid")
        .withColumn("__cum", F.col("__boff") + F.sum(count_col).over(loc_w))
        .withColumn("start_offset", (F.col("__cum") - F.col(count_col)).cast("long"))
        .withColumn("seq_id", F.floor(F.col("start_offset") / F.lit(budget)))
        .drop("__bid", "__bsum", "__boff", "__cum")
    )
    return out


def pack_summary(packed: DataFrame, count_col: str) -> DataFrame:
    """Per-sequence roll-up: how many documents start in each sequence
    and how many tokens they contribute. Lossless-ness check: the sum
    of ``total_tokens`` equals the corpus token count."""
    return packed.groupBy("seq_id").agg(
        F.count("*").alias("n_docs"), F.sum(count_col).alias("total_tokens")
    )


# ------------------------------------------------------------ shard layout
#
# The last step of a pretraining data pipeline: write the corpus as S
# shard files in a deterministic pseudo-random order (a "global
# shuffle" that no worker coordination can skew). Shard assignment is
# a pure hash; the within-shard order is a SECOND independent hash, so
# the layout is fully determined by (corpus, seed) — rerunning the
# pipeline, on any cluster size, yields byte-identical shards.
#
# Scale shape: shard = scan-side expression (no shuffle); the rank
# window is PARTITIONED BY shard, so the sort parallelizes S-ways and
# each sort is corpus/S-sized. Contrast with a single global
# orderBy(rand()) — one range-partitioned sort whose determinism dies
# with partition boundaries.


def training_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: int = 42,
) -> DataFrame:
    """Adds ``shard`` (0..n_shards-1) and ``rank`` (1-based position
    within the shard, in deterministic shuffled order)."""
    from pyspark.sql import Window

    from rustic_witcher_spark.functions.hashing import hash64

    key = F.col(id_col).cast("string")
    shard = (hash64(key, seed, "shard") % n_shards).alias("shard")
    order = hash64(key, seed, "order").alias("__ord")
    w = Window.partitionBy("shard").orderBy(F.col("__ord").asc(), F.col(id_col).asc())
    return (
        df.withColumn("shard", shard)
        .withColumn("__ord", order)
        .withColumn("rank", F.row_number().over(w))
        .drop("__ord")
    )


def sql_training_shards(id_expr: str, table: str, n_shards: int, select: str, seed: int = 42) -> str:
    """DuckDB twin of ``training_shards``."""
    from rustic_witcher_spark.functions.hashing import sql_hash64

    shard = f"({sql_hash64(id_expr, seed, 'shard')}) % {n_shards}"
    order = sql_hash64(id_expr, seed, "order")
    return f"""
WITH s AS (
  SELECT *, {shard} AS shard, {order} AS __ord FROM {table}
)
SELECT {select},
       row_number() OVER (PARTITION BY shard ORDER BY __ord ASC, {id_expr} ASC) AS rank
FROM s
"""
