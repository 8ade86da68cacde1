"""Streaming distribution-drift monitor: KL divergence of a live
corpus stream against a frozen reference unigram distribution.

The production question this answers: a crawl/ingest stream starts
delivering subtly different text (a template farm, a language drift, a
broken extractor) — the per-batch quarantine counters stay clean, but
the token MIX moves. KL(stream ‖ reference) is the standard scalar for
that, and `q_source_kl_divergence` is its batch analogue.

Design (the registry's sketch-stream pattern): Structured Streaming
allows ONE stateful aggregation per query, so the streaming face
maintains exactly the mergeable state — per-term counts, vocabulary-
bounded, merged by addition across micro-batches — and the KL itself
is a FINALIZATION over that tiny state table, computed batch-side by
the same function the batch face uses. Batch ≡ stream is therefore
structural: identical counts in, identical finalizer out (pinned by
test). State is O(|vocab|) longs regardless of stream length — the
same constant-state argument as the HLL/quantile streams.

Out-of-vocabulary terms (in the stream, absent from the reference)
would make the KL infinite; they are reported as a separate
``oov_tokens`` count instead of being folded into the divergence —
a spike there is its own drift signal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rustic_witcher_spark.operators.text import tokens


def term_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(term, n) unigram counts — the mergeable state expression.

    Works identically on a batch frame and a streaming frame (where the
    groupBy becomes the query's single stateful aggregation; run it in
    complete output mode)."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def kl_vs_reference(counts: DataFrame, reference: DataFrame) -> DataFrame:
    """One-row finalization over the state table: KL(counts ‖ ref) in
    integer nanonats (order-invariant long sum, as the batch entry),
    plus coverage diagnostics.

    ``reference`` is (term, n) counts of the frozen baseline corpus —
    vocabulary-sized, broadcast. Terms missing from the reference are
    excluded from the divergence and surfaced as ``oov_tokens``; the
    in-vocab distribution is normalized over MATCHED tokens only, so
    KL(matched ‖ ref) is a true divergence (≥ 0 up to per-term
    rounding) — normalizing over all stream tokens would scale every
    matched p by the in-vocab fraction and deflate the metric toward
    Σp·ln(frac) < 0 as OOV mass grows, masking real drift.

    The state frame is snapshotted (localCheckpoint via materialize)
    before finalizing: the finalization reads it twice (matched total
    + contributions), and against the LIVE complete-mode sink a
    micro-batch committing between those two scans would mix
    snapshots — n_tot from one batch, rows from another."""
    from rustic_witcher_spark.operators.materialize import materialize

    counts = materialize(counts.select("term", "n"))
    ref = reference.select(F.col("term"), F.col("n").alias("r_n"))
    ref_tot = reference.agg(F.sum("n").alias("r_tot"))
    joined = counts.join(F.broadcast(ref), "term", "left")
    in_ref = F.col("r_n").isNotNull()
    m_tot = joined.filter(in_ref).agg(F.sum("n").alias("m_tot"))
    scored = (
        joined.crossJoin(F.broadcast(m_tot)).crossJoin(F.broadcast(ref_tot))
    )
    p = F.col("n").cast("double") / F.col("m_tot")
    ratio = (F.col("n").cast("double") * F.col("r_tot")) / (F.col("m_tot").cast("double") * F.col("r_n"))
    contrib = F.round(p * F.log(ratio) * F.lit(1e9)).cast("long")
    return scored.agg(
        F.sum(F.when(in_ref, F.col("n")).otherwise(F.lit(0))).alias("matched_tokens"),
        F.sum(F.when(~in_ref, F.col("n")).otherwise(F.lit(0))).alias("oov_tokens"),
        F.count(F.when(~in_ref, F.lit(1))).alias("oov_terms"),
        F.sum(F.when(in_ref, contrib).otherwise(F.lit(0))).alias("kl_nanonats"),
    )


def start_drift_monitor(
    stream_docs: DataFrame,
    queryName: str,
    checkpoint: str,
    text_col: str = "text",
):
    """Run the state half as a streaming query into an in-memory sink;
    read the sink with ``spark.sql(f"SELECT * FROM {queryName}")`` and
    finalize with :func:`kl_vs_reference` whenever a reading is wanted.
    Complete mode: the sink always holds the full current state."""
    return (
        term_counts(stream_docs, text_col)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint)
        .start()
    )
