"""Hybrid retrieval: lexical + dense legs fused by reciprocal rank.

The batch face a paired-data mining / RAG-corpus pipeline needs beside
the single-system rankers (`bm25_search` lexical-only,
`similarity.brute_force_topk` dense-only): each anchor document
retrieves its fused top-k from BOTH signals, with the Cormack/Clarke/
Büttcher reciprocal-rank rule score = Σ_legs 1/(k0 + rank).

Reference scope note: the reference engine (bluegroundltd/
rustic-witcher) has no retrieval surface — this belongs to the
LLM-pipeline extension suite (SURVEY.md north-star scope).

Determinism contract (oracle-twin safe):
- per-leg scores round to 6 dp before ranking, ranks tie-break on the
  doc id — identical in Spark and any replaying engine;
- the fused score is emitted in integer MICRO-units via FLOOR division
  (floor(1e6/(k0+rank)) is exact in IEEE doubles on both engines), so
  fused ordering cannot drift on float rounding;
- absent-leg ranks surface as 0, never NULL (NULL sort order is
  engine-specific).

Scale shape (the 100 TB story): each leg broadcasts the |anchors|-row
query set against ONE corpus scan — never a corpus self-join; the
lexical leg prunes non-intersecting docs before any ranking. The
per-anchor row_number pool shuffles skinny (anchor, doc, score) rows
only; at 1000-executor scale the window swaps for the two-level salted
top-k (the `token_budget_selection` prefix-scan pattern) with identical
semantics. Fusion joins two ≤ |anchors|·pool frames — trivial anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rustic_witcher_spark.operators import similarity, text

RRF_K0 = 60  # the standard reciprocal-rank damping constant


def hybrid_rrf(
    docs: DataFrame,
    emb: DataFrame,
    anchor_ids: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    pool: int = 20,
    topk: int = 10,
    k0: int = RRF_K0,
) -> DataFrame:
    """Fused (anchor_id, doc_id, lex_rank, dense_rank, rrf_micro,
    fused_rank) — top-``topk`` per anchor. ``docs`` and ``emb`` are
    id-aligned tables (same ids name the same item); anchors absent
    from a table simply contribute nothing to that leg."""
    anchor_ids = list(anchor_ids)

    dense = similarity.brute_force_topk(
        emb, emb.filter(F.col(vec_id_col).isin(anchor_ids)), k=pool,
        id_col=vec_id_col, vec_col=vec_col,
    ).select(
        F.col("query_id").alias("anchor_id"),
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").alias("dense_rank"),
    )

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(text.tokens(F.col(text_col))).alias("t"),
    )
    anch = toks.filter(F.col("doc_id").isin(anchor_ids)).select(
        F.col("doc_id").alias("anchor_id"), F.col("t").alias("at")
    )
    inter = F.size(F.array_intersect("t", "at"))
    uni = F.size("t") + F.size("at") - inter
    scored = (
        toks.crossJoin(F.broadcast(anch))
        .filter(F.col("doc_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "doc_id",
            inter.alias("i"),
            F.round(inter / F.greatest(uni, F.lit(1)), 6).alias("sim"),
        )
        .filter(F.col("i") > 0)
    )
    w_lex = Window.partitionBy("anchor_id").orderBy(F.col("sim").desc(), F.col("doc_id").asc())
    lex = (
        scored.withColumn("lex_rank", F.row_number().over(w_lex))
        .filter(F.col("lex_rank") <= pool)
        .select("anchor_id", "doc_id", "lex_rank")
    )

    def _rrf(rank_col):
        return F.when(
            rank_col.isNotNull(),
            F.floor(F.lit(1_000_000) / (F.lit(k0) + rank_col)).cast("long"),
        ).otherwise(F.lit(0).cast("long"))

    fused = lex.join(dense, ["anchor_id", "doc_id"], "full_outer").select(
        "anchor_id",
        "doc_id",
        F.coalesce("lex_rank", F.lit(0)).cast("int").alias("lex_rank"),
        F.coalesce("dense_rank", F.lit(0)).cast("int").alias("dense_rank"),
        (_rrf(F.col("lex_rank")) + _rrf(F.col("dense_rank"))).alias("rrf_micro"),
    )
    w_fused = Window.partitionBy("anchor_id").orderBy(F.col("rrf_micro").desc(), F.col("doc_id").asc())
    return (
        fused.withColumn("fused_rank", F.row_number().over(w_fused))
        .filter(F.col("fused_rank") <= topk)
        .orderBy("anchor_id", "fused_rank")
    )
