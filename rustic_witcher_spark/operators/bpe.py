"""Distributed BPE vocabulary training over the (word, count) table.

`queries.bpe_merge_step` / `bpe_merge_chain` prove the core property —
after the corpus collapses to its vocabulary ONCE, every merge round is
arithmetic over the |vocab|-sized table, never the raw token stream.
This module runs the property to completion: ``bpe_train`` iterates N
merge rounds to produce the ranked merge list (the training artifact a
tokenizer ships), and ``bpe_apply`` segments text with a learned list.

Representation: the PUBLIC symbol string (the ``s`` column this module
returns and the CLI persists) is space-prefixed, ``' w o r d'``, the
same format as bpe_merge_chain. INTERNALLY each symbol additionally
carries a trailing ``\\x01`` sentinel (``' w\\x01 o\\x01 …'``) during the
merge loop, because the bare space-prefixed form is only left-delimited:
from merge round 2 onward a multi-char symbol can merely START with the
pair's right element, and ``replace(s, ' a b', ' ab')`` would glue its
remainder into a never-learned symbol (e.g. merging ``'a l'`` inside
``' a lo n e'`` → bogus ``'alo'``). With both a left delimiter (space)
and a right delimiter (sentinel) the pattern ``' a\\x01 b\\x01'`` can
only match a WHOLE adjacent symbol pair, so the plain greedy
left-to-right non-overlapping string replace is exactly the textbook
symbol-list merge — pinned against a boundary-aware Sennrich reference
in tests/test_bpe.py. (bpe_merge_chain itself applies only merge #1,
where every symbol is still a single character and the right boundary
is structurally guaranteed — the registered entry and its DuckDB twin
need no sentinel.)

Scale notes (the 100 TB story):

- ONE corpus pass total: the vocabulary groupBy is the only shuffle
  that ever sees the token stream. Every iteration after that runs
  over |vocab| rows with map-side-combinable aggregations.
- The per-iteration winner is ONE collected row (the merge list is the
  artifact — n_merges driver round-trips of one row each, the standard
  shape of every distributed BPE trainer; job-scheduling latency, not
  data volume, bounds the iteration rate).
- Lineage is truncated every ``checkpoint_every`` merges
  (localCheckpoint): the symbol column accrues one nested replace per
  round, and an unbounded expression tree would make Catalyst analysis
  quadratic in N. Between checkpoints, re-derivation is cheap because
  the vocabulary shuffle's files persist and its stage is skipped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rustic_witcher_spark.operators import text as text_ops


# Right-boundary sentinel appended to every symbol during the merge
# loop (see module docstring). text.tokens only lowercases/collapses
# whitespace, so a literal \x01 in scraped corpus text WOULD survive
# tokenization and forge symbol boundaries — _clean_tokens below strips
# it from every token before symbolization (train and apply alike).
SENT = "\x01"


def _clean_tokens(col: Column) -> Column:
    """Corpus tokens with the internal sentinel char removed. Control
    chars are common in scraped pre-training data; without this, a
    token containing ``\\x01`` corrupts the symbol representation
    (phantom boundaries during training, silent char loss + empty
    tokens at apply time). Tokens that were ONLY sentinels drop out."""
    stripped = F.transform(
        text_ops.tokens(col), lambda t: F.replace(t, F.lit(SENT), F.lit(""))
    )
    return F.filter(stripped, lambda t: F.length(t) > 0)


def _to_symbols(word: Column) -> Column:
    """word -> sentinel-delimited symbol string (' w\\x01 o\\x01 …')."""
    return F.regexp_replace(word, F.lit("(.)"), F.lit(f" $1{SENT}"))


def _strip_sent(s: Column) -> Column:
    """Internal sentinel form -> public ' w o r d' form."""
    return F.replace(s, F.lit(SENT), F.lit(""))


def _merge_pattern(pair: str) -> tuple[str, str]:
    """(search, replacement) literals for one merge, both boundaries
    delimited so only a whole adjacent symbol pair can match."""
    a, b = pair.split(" ")
    return f" {a}{SENT} {b}{SENT}", f" {a}{b}{SENT}"


def _pair_counts(sym: DataFrame) -> DataFrame:
    """Adjacent symbol-pair corpus frequencies over the vocab table.
    The symbol array is let-bound before the pair lambda (HOF capture
    trap); output is (pair, n) with pair = 'a b'."""
    arr = sym.select(
        "wc", F.split(F.substring(_strip_sent(F.col("s")), 2, 1 << 30), " ").alias("a")
    )
    pairs = arr.filter(F.size("a") >= 2).select(
        "wc",
        F.explode(
            F.expr("transform(sequence(1, size(a) - 1), i -> concat(element_at(a, i), ' ', element_at(a, i + 1)))")
        ).alias("pair"),
    )
    return pairs.groupBy("pair").agg(F.sum("wc").alias("n"))


def vocab_table(docs: DataFrame, text_col: str = "text", min_len: int = 2) -> DataFrame:
    """(w, wc): the corpus vocabulary — the ONLY token-stream shuffle
    of the whole training run."""
    return (
        docs.select(F.explode(_clean_tokens(F.col(text_col))).alias("w"))
        .filter(F.length("w") >= min_len)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    min_len: int = 2,
    checkpoint_every: int = 8,
    return_trace: bool = False,
):
    """Learn ``n_merges`` BPE merges; returns (merges, final symbol
    vocab). ``merges[i]`` is the round-i winning pair ``'a b'`` (max
    corpus frequency, ties to the lexicographically smallest pair —
    deterministic). Training stops early when no pair occurs twice
    (merging singletons adds no compression).

    The returned DataFrame is the trained state: (w, wc, s) with ``s``
    the fully-merged symbol string per vocabulary word — token counts
    per merged symbol derive from it without touching the corpus.

    ``return_trace=True`` additionally returns the per-round winner
    trace ``[(pair, n), ...]`` — the corpus-weighted frequency each
    winner held WHEN it was chosen, i.e. the training curve. The
    driver-graded ``bpe_vocab_trained`` entry emits exactly this
    trace, putting the full recurrence (counts round i depend on the
    replaces of rounds 1..i-1, sentinel machinery included) under the
    oracle gate; it costs nothing extra — the winner row is collected
    each round regardless.
    """
    from rustic_witcher_spark.operators.materialize import materialize

    # Materialize the vocab table ONCE before the merge loop: each
    # round's top-pair collect re-executes its full lineage, and
    # exchange reuse does not span queries — so without the cut every
    # round re-ran the corpus-wide explode+groupBy (n_merges corpus
    # passes instead of one). The checkpointed state is vocab-sized
    # (the BPE trainer's whole scale argument); rounds then cost
    # pair-count aggregates over the vocab only.
    sym = materialize(
        vocab_table(docs, text_col, min_len).select(
            "w", "wc", _to_symbols(F.col("w")).alias("s")
        )
    )
    merges: list[str] = []
    trace: list[tuple[str, int]] = []
    for i in range(n_merges):
        top = _pair_counts(sym).orderBy(F.desc("n"), F.asc("pair")).limit(1).collect()
        if not top or top[0]["n"] < 2:
            break
        pair = top[0]["pair"]
        merges.append(pair)
        trace.append((pair, int(top[0]["n"])))
        search, repl = _merge_pattern(pair)
        sym = sym.withColumn("s", F.replace(F.col("s"), F.lit(search), F.lit(repl)))
        if (i + 1) % checkpoint_every == 0:
            sym = sym.localCheckpoint(eager=True)
    final = sym.withColumn("s", _strip_sent(F.col("s")))
    if return_trace:
        return merges, final, trace
    return merges, final


def bpe_apply(
    df: DataFrame, text_col: str, merges: list[str], out_col: str = "bpe_tokens", min_len: int = 2
) -> DataFrame:
    """Segment text with a learned merge list: per word, replay the
    merges IN TRAINING ORDER (the standard BPE inference rule) as a
    chain of literal replaces inside ONE transform lambda — a single
    generated projection, order-preserving, no UDF, no join, no
    shuffle; short words (< min_len, excluded from training) pass
    through as single tokens. Adds ``out_col`` array<string>."""

    def segment(w):
        s = _to_symbols(w)
        for pair in merges:
            search, repl = _merge_pattern(pair)
            s = F.replace(s, F.lit(search), F.lit(repl))
        return F.when(F.length(w) < min_len, F.array(w)).otherwise(
            F.split(F.substring(_strip_sent(s), 2, 1 << 30), " ")
        )

    return df.withColumn(
        out_col, F.flatten(F.transform(_clean_tokens(F.col(text_col)), segment))
    )
