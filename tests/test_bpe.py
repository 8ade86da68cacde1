"""Distributed BPE training loop (operators/bpe.py): the full N-merge
run pinned against a textbook pure-Python reference (same tie-breaks,
same greedy left-to-right merge), apply-round-trip, early stop, and
composition with the registered bpe_merge_step/chain entries."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from rustic_witcher_spark.operators import bpe

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "the lazy dog sleeps while the quick fox runs again"),
    (3, "quick brown foxes and lazy dogs are the classic corpus"),
    (4, "low lower lowest newer newest wide wider widest"),
    (5, "low low low lower lower newest newest newest newest"),
]


def _norm_tokens(text):
    """Mirror text.tokens: lowercase, non-alnum -> space, split."""
    return [w for w in re.sub(r"[^a-z0-9]+", " ", text.lower()).split() if w]


def _merge_syms(syms, a, b):
    """Boundary-aware greedy left-to-right Sennrich merge over a symbol
    LIST — a pair only matches two whole adjacent symbols, never a
    symbol that merely starts with `b` (the glue bug a naive string
    replace has from merge round 2 onward)."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _reference_bpe(texts, n_merges, min_len=2):
    """Textbook Sennrich-style BPE on the vocab table: max-frequency
    pair, ties to lexicographically smallest; boundary-aware greedy
    left-to-right merge over symbol lists."""
    vocab = Counter()
    for t in texts:
        for w in _norm_tokens(t):
            if len(w) >= min_len:
                vocab[w] += 1
    sym = {tuple(w): c for w, c in vocab.items()}
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for a, c in sym.items():
            for i in range(len(a) - 1):
                counts[f"{a[i]} {a[i + 1]}"] += c
        if not counts:
            break
        top_n = max(counts.values())
        if top_n < 2:
            break
        # ties -> lexicographically smallest pair
        pair = min(p for p, n in counts.items() if n == top_n)
        merges.append(pair)
        a, b = pair.split(" ")
        sym = {tuple(_merge_syms(list(s), a, b)): c for s, c in sym.items()}
    return merges, {" " + " ".join(s): c for s, c in sym.items()}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def test_train_matches_reference_implementation(spark, docs):
    merges, sym = bpe.bpe_train(docs, "text", n_merges=12, checkpoint_every=4)
    ref_merges, ref_sym = _reference_bpe([t for _, t in CORPUS], 12)
    assert merges == ref_merges
    got = {(r["s"], r["wc"]) for r in sym.collect()}
    want = set(ref_sym.items())
    assert got == want


def test_apply_reproduces_training_segmentation(spark, docs):
    """bpe_apply on the training corpus must segment every vocabulary
    word exactly as the trained symbol table says."""
    merges, sym = bpe.bpe_train(docs, "text", n_merges=10)
    seg_by_word = {r["w"]: r["s"][1:].split(" ") for r in sym.collect()}
    out = bpe.bpe_apply(docs, "text", merges).collect()
    for r in out:
        toks = _norm_tokens(r["text"])
        want = []
        for w in toks:
            want.extend(seg_by_word.get(w, [w]) if len(w) >= 2 else [w])
        assert r["bpe_tokens"] == want, r["text"]


def test_apply_on_unseen_text_uses_training_order(spark, docs):
    """Inference replays merges in training order on words never seen
    in training — the standard BPE generalization rule, checked against
    the reference replay."""
    merges, _ = bpe.bpe_train(docs, "text", n_merges=12)
    new = spark.createDataFrame([(1, "lowering thequick dogged")], ["id", "text"])
    got = bpe.bpe_apply(new, "text", merges).collect()[0]["bpe_tokens"]
    want = []
    for w in _norm_tokens("lowering thequick dogged"):
        syms = list(w)
        for pair in merges:
            a, b = pair.split(" ")
            syms = _merge_syms(syms, a, b)
        want.extend(syms)
    assert got == want


def test_early_stop_when_no_pair_repeats(spark):
    tiny = spark.createDataFrame([(1, "ab cd ef")], ["id", "text"])
    merges, sym = bpe.bpe_train(tiny, "text", n_merges=50)
    # every pair occurs once -> nothing merges
    assert merges == []
    assert {r["s"] for r in sym.collect()} == {" a b", " c d", " e f"}


def test_first_two_merges_agree_with_registered_chain_entries(spark, docs):
    """Composition with the driver-graded entries: merge #1 equals
    bpe_merge_step's top pair; merge #2 equals the winner of the
    recount that bpe_merge_chain performs after applying merge #1."""
    merges, _ = bpe.bpe_train(docs, "text", n_merges=2)
    words = bpe.vocab_table(docs, "text")
    p1 = words.select(
        F.explode(F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).alias("pair"),
        "wc",
    )
    step1 = p1.groupBy("pair").agg(F.sum("wc").alias("n")).orderBy(F.desc("n"), F.asc("pair")).limit(1)
    want1 = step1.collect()[0]["pair"]
    assert merges[0] == f"{want1[0]} {want1[1]}"
    # merge #2 = the winner of the recount bpe_merge_chain performs
    # after applying merge #1 (replicated with the chain entry's exact
    # expressions: at merge #1 every symbol is one char, so the chain's
    # plain space-prefixed replace is boundary-safe)
    sym1 = words.select(
        "wc",
        F.replace(
            F.regexp_replace(F.col("w"), F.lit("(.)"), F.lit(" $1")),
            F.lit(" " + " ".join(merges[0].split(" "))),
            F.lit(" " + merges[0].replace(" ", "")),
        ).alias("s"),
    )
    arr = sym1.select("wc", F.split(F.expr("substring(s, 2)"), " ").alias("a"))
    p2 = arr.filter(F.size("a") >= 2).select(
        "wc",
        F.explode(
            F.expr("transform(sequence(1, size(a) - 1), i -> concat(element_at(a, i), ' ', element_at(a, i + 1)))")
        ).alias("pair"),
    )
    step2 = p2.groupBy("pair").agg(F.sum("wc").alias("n")).orderBy(F.desc("n"), F.asc("pair")).limit(1)
    assert merges[1] == step2.collect()[0]["pair"]


def test_merge_never_glues_across_symbol_boundaries(spark):
    """Regression for the right-boundary glue bug: merging 'a l' must
    NOT consume the 'l' prefix of the already-merged symbol 'lo' in
    ' a lo n e'. Corpus engineered so merge #1 = 'l o' (freq 7) and
    merge #2 = 'a l' (freq 4, from alp/alf only after merge #1)."""
    text = "lot lot lot log log log alp alp alf alf alone"
    docs = spark.createDataFrame([(1, text)], ["id", "text"])
    merges, sym = bpe.bpe_train(docs, "text", n_merges=3)
    by_word = {r["w"]: r["s"] for r in sym.collect()}
    assert merges[:2] == ["l o", "a l"]
    # the buggy replace produced ' alo n e' here (glued symbol 'alo')
    assert by_word["alone"] == " a lo n e"
    assert by_word["alp"] == " al p" and by_word["alf"] == " al f"
    ref_merges, ref_sym = _reference_bpe([text], 3)
    assert merges == ref_merges
    assert {(r["s"], r["wc"]) for r in sym.collect()} == set(ref_sym.items())


def test_cli_bpe_train_round_trip(spark, docs, tmp_path, capsys):
    import json

    from rustic_witcher_spark import cli

    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "tok")
    assert cli.main(["bpe-train", "--source", src, "--merges", "8", "--target", out]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["merges_learned"] == 8
    merges = json.load(open(f"{out}/merges.json"))
    want, _ = _reference_bpe([t for _, t in CORPUS], 8)
    assert merges == want
    vocab = spark.read.parquet(f"{out}/vocab")
    assert vocab.count() > 0 and set(vocab.columns) == {"w", "wc", "s"}


def test_cli_tokenize_with_packing(spark, docs, tmp_path, capsys):
    """bpe-train -> tokenize --pack-budget: the end-to-end tokenizer
    leg; offsets are the exact prefix sums of the learned token counts
    in id order."""
    import json

    from rustic_witcher_spark import cli

    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    tok = str(tmp_path / "tok")
    assert cli.main(["bpe-train", "--source", src, "--merges", "6", "--target", tok]) == 0
    capsys.readouterr()
    out = str(tmp_path / "tokens")
    assert cli.main([
        "tokenize", "--source", src, "--merges", f"{tok}/merges.json",
        "--id-col", "doc_id", "--target", out, "--pack-budget", "16",
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["rows"] == len(CORPUS) and rep["merges_applied"] == 6
    rows = sorted(
        (r["doc_id"], r["n_tokens"], r["start_offset"], r["seq_id"])
        for r in spark.read.parquet(out).collect()
    )
    # offsets = exclusive prefix sums in doc_id order; seq = offset//16
    run = 0
    for doc_id, n, off, seq in rows:
        assert off == run and seq == run // 16
        run += n
    assert rep["tokens"] == run and rep["sequences"] == len({r[3] for r in rows})


def test_empty_and_null_text(spark):
    df = spark.createDataFrame([(1, None), (2, ""), (3, "aa aa bb")], "id long, text string")
    merges, _ = bpe.bpe_train(df, "text", n_merges=3)
    # 'a a' occurs twice -> merged; 'b b' occurs once -> early-stopped
    assert merges == ["a a"]
    out = {r["id"]: r["bpe_tokens"] for r in bpe.bpe_apply(df, "text", merges).collect()}
    assert out[1] == [] and out[2] == []
    assert out[3] == ["aa", "aa", "b", "b"]


def test_sentinel_char_in_corpus_is_stripped_not_corrupting(spark):
    """Regression: a literal \\x01 (the internal right-boundary
    sentinel) in scraped corpus text must not forge symbol boundaries.
    text.tokens only lowercases/collapses whitespace, so without the
    token-level strip the trainer selects degenerate empty-left-symbol
    pairs forever (no early stop) and bpe_apply emits empty tokens and
    silently drops the character. Training and segmentation must behave
    exactly as if the sentinel char were absent."""
    dirty = [
        (1, "ab\x01cd ab\x01cd xx yy"),
        (2, "low low low\x01 lower lower"),
        (3, "\x01\x01 newest newest"),  # a token that is ONLY sentinels
    ]
    clean_texts = [t.replace("\x01", "") for _, t in dirty]

    df = spark.createDataFrame(dirty, "id long, text string")
    merges, vocab = bpe.bpe_train(df, "text", n_merges=6)
    want_merges, want_vocab = _reference_bpe(clean_texts, 6)
    assert merges == want_merges
    assert {(r["s"], r["wc"]) for r in vocab.collect()} == set(want_vocab.items())

    out = {r["id"]: r["bpe_tokens"] for r in bpe.bpe_apply(df, "text", merges).collect()}
    for (i, _), clean in zip(dirty, clean_texts):
        want = []
        for w in _norm_tokens(clean):
            if len(w) < 2:
                want.append(w)
                continue
            syms = list(w)
            for pair in merges:
                a, b = pair.split(" ")
                syms = _merge_syms(syms, a, b)
            want.extend(syms)
        assert out[i] == want, (i, out[i], want)
        assert all(t and "\x01" not in t for t in out[i])
