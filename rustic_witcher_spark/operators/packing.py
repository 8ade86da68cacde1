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
2. exclusive-prefix-sum the tiny per-block table (a window over
   ``n_docs / block`` rows — choose ``block`` so this is at most a few
   million rows; for larger corpora add a third level, same recurrence);
3. broadcast the block offsets back and finish with a PER-BLOCK window
   (partitioned by block id, so it parallelizes across executors).

global_cumsum(doc) = block_offset(block(doc)) + local_cumsum(doc)

The result is deterministic in the document id order, independent of
physical partitioning — the property that makes packing reproducible
across cluster sizes and re-runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    count_col: str,
    budget: int,
    block: int = 64,
) -> DataFrame:
    """Assign each row to its concat-and-chunk sequence.

    Adds columns:
      ``start_offset`` — position of the row's first token in the
        concatenated stream (0-based), ordered by ``id_col``;
      ``seq_id``       — ``start_offset // budget``, the training
        sequence the row starts in.
    """
    bid = F.floor(F.col(id_col) / F.lit(block)).alias("__bid")
    d = df.withColumn("__bid", bid)

    # (1) per-block sums: partial-aggregates map-side, tiny shuffle
    bsums = d.groupBy("__bid").agg(F.sum(count_col).alias("__bsum"))

    # (2) exclusive prefix over the block table. Unpartitioned window,
    # intentionally: it runs over n_rows/block rows, not the corpus —
    # the whole point of the two-level scan. rowsBetween(-inf, -1)
    # makes it exclusive (first block offset = 0).
    off_w = Window.orderBy("__bid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bsums.select(
        "__bid", F.coalesce(F.sum("__bsum").over(off_w), F.lit(0)).alias("__boff")
    )

    # (3) per-block inclusive cumsum, parallel across blocks
    loc_w = Window.partitionBy("__bid").orderBy(id_col).rowsBetween(Window.unboundedPreceding, 0)
    out = (
        d.join(F.broadcast(offsets), "__bid")
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
