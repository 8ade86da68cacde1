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
