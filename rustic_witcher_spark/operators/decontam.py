"""Test-set decontamination (north-star extension).

Benchmark contamination — training documents that textually overlap an
evaluation set — is detected the way the big public pipelines do it:
flag any training document that shares at least one word n-gram with
any eval document.

Scale shape (the eval set is always tiny relative to the corpus):
- each side is ONE projection: token md5s combined arithmetically into
  rolling n-gram hashes (one md5 per TOKEN, not per gram — same trick
  as minhash's signature builder in ``dedup.word_shingle_hashes``);
- the eval gram set is deduplicated and BROADCAST — the corpus-side
  scan joins against it with zero shuffle of the training data;
- the per-document hit count is a map-side-combinable groupBy on the
  training document id.

No self-join, no all-pairs, nothing quadratic: cost is one corpus scan
plus a broadcast hash probe per gram.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rustic_witcher_spark.functions.hashing import hash64, sql_hash64
from rustic_witcher_spark.functions.wordlists import DEFAULT_SEED
from rustic_witcher_spark.operators.dedup import MERSENNE_31, normalized_text

_SALT = "dc"
_W = 1_000_003  # rolling-hash weight base (same family as dedup's gram combine)


def ngram_weights(n: int) -> list[int]:
    """Position weights W^(n-1), ..., W^1, W^0 mod M31."""
    return [pow(_W, n - 1 - j, MERSENNE_31) for j in range(n)]


def word_ngram_hashes(col: Column, n: int, seed: int = DEFAULT_SEED) -> Column:
    """Distinct hashes of word n-grams as array<bigint>.

    One md5 per token; gram hash = sum_j w_j * h(t_{i+j}) mod M31 with
    each product reduced before summing (n * 2^31 < 2^63 — no overflow
    for any practical n). Documents with fewer than ``n`` tokens yield
    an empty array: a document too short to contain an n-gram cannot be
    contaminated at that n.
    """
    ws = ngram_weights(n)
    toks = F.split(normalized_text(col), " ")
    th = F.transform(toks, lambda t: hash64(t, seed, _SALT) % MERSENNE_31)

    def grams_fn(h: Column) -> Column:
        def one(i: Column) -> Column:
            acc = (F.element_at(h, i) * ws[0]) % MERSENNE_31
            for j in range(1, n):
                acc = acc + (F.element_at(h, i + j) * ws[j]) % MERSENNE_31
            return acc % MERSENNE_31

        return F.transform(F.sequence(F.lit(1), F.size(h) - (n - 1)), one)

    # let-bind th (one hashing pass per row, see dedup.py for the idiom)
    grams = F.element_at(F.transform(F.array(th), grams_fn), 1)
    empty = F.array().cast("array<bigint>")
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(empty)


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """Per-training-document count of distinct n-grams shared with the
    eval set. Only contaminated documents (count >= 1) are returned:
    (id_col, n_shared)."""
    grams = word_ngram_hashes(F.col(text_col), n, seed)
    tg = train.select(F.col(id_col), F.explode(grams).alias("__g"))
    eg = eval_df.select(F.explode(grams).alias("__g")).distinct()
    return (
        tg.join(F.broadcast(eg), "__g")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared"))
    )


def sql_token_hashes(norm_expr: str, seed: int = DEFAULT_SEED) -> str:
    """DuckDB token-hash list; bind as a CTE column named ``__th``."""
    return f"list_transform(string_split({norm_expr}, ' '), t -> ({sql_hash64('t', seed, _SALT)}) % {MERSENNE_31})"


def sql_word_ngram_hashes(n: int) -> str:
    """DuckDB twin of ``word_ngram_hashes``: a list-typed expression
    over a column ``__th`` (see ``sql_token_hashes``) that the caller
    binds in an enclosing CTE — mirroring the Spark side's let-binding
    so the token-hash pass is written (and executed) once."""
    ws = ngram_weights(n)
    terms = " + ".join(f"(__th[i + {j}] * {ws[j]}) % {MERSENNE_31}" for j in range(n))
    grams = f"list_transform(generate_series(1, len(__th) - {n - 1}), i -> ({terms}) % {MERSENNE_31})"
    return f"(CASE WHEN len(__th) >= {n} THEN list_distinct({grams}) ELSE []::BIGINT[] END)"
