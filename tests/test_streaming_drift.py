"""Streaming drift monitor: batch ≡ stream state, KL finalization
semantics, OOV accounting (streaming/drift.py)."""

from __future__ import annotations

import json
import math

import pytest

from rustic_witcher_spark.streaming.drift import kl_vs_reference, start_drift_monitor, term_counts

DOC_SCHEMA = "doc_id long, text string"


def _write_jsonl(path, docs):
    path.write_text("\n".join(json.dumps({"doc_id": i, "text": t}) for i, t in docs) + "\n")


def test_stream_counts_equal_batch_counts(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    b1 = [(1, "a b b c"), (2, "c a a")]
    b2 = [(3, "b c z z")]
    _write_jsonl(src / "b1.jsonl", b1)
    qname = f"drift_{abs(hash(str(tmp_path))) % 10**8}"
    stream = spark.readStream.schema(DOC_SCHEMA).json(str(src))
    q = start_drift_monitor(stream, qname, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
        _write_jsonl(src / "b2.jsonl", b2)
        q.processAllAvailable()
        got = {r["term"]: r["n"] for r in spark.sql(f"SELECT * FROM {qname}").collect()}
    finally:
        q.stop()
    batch = spark.createDataFrame(
        [(i, t) for i, t in b1 + b2], DOC_SCHEMA
    )
    want = {r["term"]: r["n"] for r in term_counts(batch).collect()}
    assert got == want == {"a": 3, "b": 3, "c": 3, "z": 2}


def test_kl_finalizer_zero_on_matching_distribution(spark):
    counts = spark.createDataFrame([("a", 10), ("b", 30)], "term string, n long")
    ref = spark.createDataFrame([("a", 100), ("b", 300)], "term string, n long")
    r = kl_vs_reference(counts, ref).collect()[0]
    assert r["kl_nanonats"] == 0
    assert r["oov_tokens"] == 0 and r["oov_terms"] == 0
    assert r["matched_tokens"] == 40


def test_kl_finalizer_positive_on_drift_and_counts_oov(spark):
    # stream heavily overweights 'b' and introduces unseen 'q'
    counts = spark.createDataFrame([("a", 5), ("b", 90), ("q", 5)], "term string, n long")
    ref = spark.createDataFrame([("a", 500), ("b", 500)], "term string, n long")
    r = kl_vs_reference(counts, ref).collect()[0]
    assert r["oov_tokens"] == 5 and r["oov_terms"] == 1
    assert r["matched_tokens"] == 95
    # hand-computed over the MATCHED (in-vocab) distribution:
    # p_a=5/95, ratio_a=(5*1000)/(95*500); p_b=90/95, ratio_b=(90*1000)/(95*500)
    pa, ra = 5 / 95, (5 * 1000) / (95 * 500)
    pb, rb = 90 / 95, (90 * 1000) / (95 * 500)
    got_terms = round(pa * math.log(ra) * 1e9) + round(pb * math.log(rb) * 1e9)
    assert r["kl_nanonats"] == got_terms
    assert r["kl_nanonats"] > 0


def test_kl_oov_mass_does_not_deflate_matched_divergence(spark):
    """Review regression: the in-vocab mix here is IDENTICAL to the
    reference (5:3), so KL must be exactly 0 no matter how much OOV
    mass arrives — the old all-token normalization reported a large
    NEGATIVE divergence (0.8·ln 0.8) that grew with OOV and could mask
    real drift."""
    counts = spark.createDataFrame([("a", 50), ("b", 30), ("q", 20)], "term string, n long")
    ref = spark.createDataFrame([("a", 500), ("b", 300)], "term string, n long")
    r = kl_vs_reference(counts, ref).collect()[0]
    assert r["kl_nanonats"] == 0
    assert r["oov_tokens"] == 20 and r["matched_tokens"] == 80


def test_drift_reading_composes_with_live_sink(spark, tmp_path):
    """End-to-end: reference from a baseline frame, stream two batches,
    take a KL reading from the live sink between batches."""
    src = tmp_path / "in"
    src.mkdir()
    ref = term_counts(spark.createDataFrame([(0, "a b c a b c")], DOC_SCHEMA))
    _write_jsonl(src / "b1.jsonl", [(1, "a b c")])
    qname = f"driftlive_{abs(hash(str(tmp_path))) % 10**8}"
    q = start_drift_monitor(spark.readStream.schema(DOC_SCHEMA).json(str(src)), qname, str(tmp_path / "ck"))
    try:
        q.processAllAvailable()
        r1 = kl_vs_reference(spark.sql(f"SELECT * FROM {qname}"), ref).collect()[0]
        assert r1["kl_nanonats"] == 0  # same uniform mix as the reference
        _write_jsonl(src / "b2.jsonl", [(2, "c c c c c c")])
        q.processAllAvailable()
        r2 = kl_vs_reference(spark.sql(f"SELECT * FROM {qname}"), ref).collect()[0]
        assert r2["kl_nanonats"] > 0  # mix drifted toward 'c'
        assert r2["oov_tokens"] == 0
    finally:
        q.stop()


def test_cli_drift_reports_kl(spark, tmp_path, capsys):
    from rustic_witcher_spark import cli

    ref = str(tmp_path / "ref.parquet")
    cur = str(tmp_path / "cur.parquet")
    spark.createDataFrame([(1, "a b c a b c")], DOC_SCHEMA).write.parquet(ref)
    spark.createDataFrame([(2, "a b c"), (3, "c c c z")], DOC_SCHEMA).write.parquet(cur)
    assert cli.main(["drift", "--input", cur, "--reference", ref]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["oov_tokens"] == 1 and rep["oov_terms"] == 1  # 'z'
    assert rep["matched_tokens"] == 6
    assert rep["kl_nanonats"] > 0  # mix drifted toward 'c'


def test_cli_drift_reference_top_k_caps_vocab(spark, tmp_path, capsys):
    """--reference-top-k replays the vocab-bounded reference the
    drift_vs_reference entry and the streaming monitor use: terms
    outside the frozen top-K count as OOV instead of matching."""
    from rustic_witcher_spark import cli

    ref = str(tmp_path / "ref.parquet")
    cur = str(tmp_path / "cur.parquet")
    # reference: 'a' dominates, 'b' second, 'c' rare (the drop-out at K=2)
    spark.createDataFrame([(1, "a a a a b b c")], DOC_SCHEMA).write.parquet(ref)
    spark.createDataFrame([(2, "a b c c")], DOC_SCHEMA).write.parquet(cur)
    assert cli.main(["drift", "--input", cur, "--reference", ref, "--reference-top-k", "2"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["matched_tokens"] == 2  # a + b
    assert rep["oov_tokens"] == 2 and rep["oov_terms"] == 1  # both c's
    # uncapped: c matches the reference's own c
    assert cli.main(["drift", "--input", cur, "--reference", ref]) == 0
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["matched_tokens"] == 4 and rep2["oov_tokens"] == 0
