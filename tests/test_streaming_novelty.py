"""Streaming novelty appender: ascending-cut stream ≡ the batch
first-owner derivation, replay idempotence, crash-replay, empty
batches (streaming/novelty.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from rustic_witcher_spark.operators.dedup import word_shingle_hashes
from rustic_witcher_spark.streaming.novelty import (
    META_NAME,
    novelty_append_batch,
    read_novelty_scores,
)
from rustic_witcher_spark.streaming.replay_meta import load_meta

SCHEMA = "doc_id long, text string"

_DOCS = [
    (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # exact copy
    (2, "totally fresh words never seen anywhere before in the corpus stream"),
    (3, "alpha beta gamma delta epsilon mixed with fresh tail words here"),
    (4, "another entirely new document body with its own vocabulary terms"),
    (5, "totally fresh words never seen anywhere before in the corpus stream"),  # copy of 2
]


def _batch_expected(spark, docs):
    """The batch face's derivation (queries.novelty_scores shape) over
    the FULL corpus: first owner = global min doc_id per gram."""
    from pyspark.sql import Window

    d = spark.createDataFrame(docs, SCHEMA)
    sg = d.select(
        "doc_id",
        F.explode(F.array_distinct(word_shingle_hashes(F.col("text")))).alias("g"),
    )
    out = (
        sg.withColumn("first_doc", F.min("doc_id").over(Window.partitionBy("g")))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("int")).alias("n_novel"),
        )
    )
    return {r["doc_id"]: (r["n_shingles"], r["n_novel"]) for r in out.collect()}


def _stream_scores(spark, idx):
    return {
        r["doc_id"]: (r["n_shingles"], r["n_novel"])
        for r in read_novelty_scores(spark, idx).collect()
    }


def test_ascending_cuts_equal_batch_first_owner(spark, tmp_path):
    idx = str(tmp_path / "idx")
    for bid, lo, hi in [(0, 0, 2), (1, 2, 5), (2, 5, 6)]:
        b = spark.createDataFrame(_DOCS[lo:hi], SCHEMA)
        assert novelty_append_batch(b, bid, idx)
    assert _stream_scores(spark, idx) == _batch_expected(spark, _DOCS)
    # different ascending cuts → same scores
    idx2 = str(tmp_path / "idx2")
    for bid, lo, hi in [(0, 0, 1), (1, 1, 4), (2, 4, 6)]:
        b = spark.createDataFrame(_DOCS[lo:hi], SCHEMA)
        assert novelty_append_batch(b, bid, idx2)
    assert _stream_scores(spark, idx2) == _batch_expected(spark, _DOCS)


def test_copy_has_zero_novelty_original_full(spark, tmp_path):
    idx = str(tmp_path / "idx")
    novelty_append_batch(spark.createDataFrame(_DOCS[:2], SCHEMA), 0, idx)
    novelty_append_batch(spark.createDataFrame(_DOCS[2:], SCHEMA), 1, idx)
    s = _stream_scores(spark, idx)
    assert s[0][1] == s[0][0]  # original: all novel
    assert s[1][1] == 0        # same-batch exact copy: nothing novel
    assert s[5][1] == 0        # cross-batch copy of doc 2: nothing novel
    assert s[2][1] == s[2][0]  # the doc it copies was fully novel


def test_replayed_batch_id_is_skipped(spark, tmp_path):
    idx = str(tmp_path / "idx")
    b = spark.createDataFrame(_DOCS[:2], SCHEMA)
    assert novelty_append_batch(b, 0, idx)
    rows = load_meta(idx, META_NAME)["indexed_rows"]
    assert not novelty_append_batch(b, 0, idx)
    assert load_meta(idx, META_NAME)["indexed_rows"] == rows


def test_crash_replay_rescores_against_pre_batch_index(spark, tmp_path):
    """Data landed for batch 1 but the meta write was lost: the replay
    must not see batch 1's own grams (which would zero its novelty) and
    must rewrite its partitions to the identical state."""
    idx = str(tmp_path / "idx")
    novelty_append_batch(spark.createDataFrame(_DOCS[:2], SCHEMA), 0, idx)
    b1 = spark.createDataFrame(_DOCS[2:4], SCHEMA)
    assert novelty_append_batch(b1, 1, idx)
    want = _stream_scores(spark, idx)
    want_rows = load_meta(idx, META_NAME)["indexed_rows"]
    # simulate the crash: roll the meta back to batch 0's state
    import json

    meta_file = os.path.join(idx, META_NAME)
    m = json.load(open(meta_file))
    m["last_batch_id"] = 0
    b0_rows = spark.read.parquet(os.path.join(idx, "data", "batch=0")).count()
    m["indexed_rows"] = b0_rows
    json.dump(m, open(meta_file, "w"))
    assert novelty_append_batch(b1, 1, idx)  # replays
    assert _stream_scores(spark, idx) == want
    assert load_meta(idx, META_NAME)["indexed_rows"] == want_rows


def test_empty_batch_advances_cursor_without_touching_index(spark, tmp_path):
    idx = str(tmp_path / "idx")
    novelty_append_batch(spark.createDataFrame(_DOCS[:2], SCHEMA), 0, idx)
    rows = load_meta(idx, META_NAME)["indexed_rows"]
    empty = spark.createDataFrame([], SCHEMA)
    assert novelty_append_batch(empty, 1, idx)
    meta = load_meta(idx, META_NAME)
    assert meta["last_batch_id"] == 1 and meta["indexed_rows"] == rows
    # and the next real batch still scores correctly
    assert novelty_append_batch(spark.createDataFrame(_DOCS[2:], SCHEMA), 2, idx)
    assert _stream_scores(spark, idx) == _batch_expected(spark, _DOCS)


def test_index_gram_set_invariant_under_cuts(spark, tmp_path):
    """The persisted (g, first_doc) set equals the batch derivation's
    first-owner table regardless of where the cuts fall."""
    from pyspark.sql import Window

    d = spark.createDataFrame(_DOCS, SCHEMA)
    sg = d.select(
        "doc_id", F.explode(F.array_distinct(word_shingle_hashes(F.col("text")))).alias("g")
    )
    want = {
        (r["g"], r["first_doc"])
        for r in sg.groupBy("g").agg(F.min("doc_id").alias("first_doc")).collect()
    }
    idx = str(tmp_path / "idx")
    for bid, lo, hi in [(0, 0, 3), (1, 3, 3), (2, 3, 6)]:  # includes an empty cut
        novelty_append_batch(spark.createDataFrame(_DOCS[lo:hi], SCHEMA), bid, idx)
    got = {
        (r["g"], r["first_doc"])
        for r in spark.read.schema("g long, first_doc long, batch long")
        .parquet(os.path.join(idx, "data"))
        .select("g", "first_doc")
        .collect()
    }
    assert got == want
