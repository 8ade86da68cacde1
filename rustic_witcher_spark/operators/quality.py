"""Document-quality and PII operators for LLM-data pipelines
(north-star extension, public-method lineage: Gopher/C4-style
heuristic filters and regex PII scrubbing).

All pure Catalyst expressions — per-document projections at scan
speed, no shuffle, no Python — each with an exact DuckDB oracle twin.
Regex patterns are restricted to the Java-regex ∩ RE2 common subset
(no lookaround, ASCII classes) so Spark and DuckDB agree byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from rustic_witcher_spark.operators.text import tokens

# --------------------------------------------------- repetition statistics


def bigrams_of(t: Column) -> Column:
    """Adjacent bigrams of a token array as 'a b' strings ([] for <2)."""
    return F.when(F.size(t) < 2, F.array().cast("array<string>")).otherwise(
        F.zip_with(
            F.slice(t, 1, F.size(t) - 1),
            F.slice(t, 2, F.size(t) - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    )


def bigrams(col: Column) -> Column:
    """Adjacent token bigrams of a text column."""
    return bigrams_of(tokens(col))


def _max_run_fraction(arr: Column) -> Column:
    """max frequency of any element / total elements, via one pass over
    the SORTED array (equal elements are adjacent after sorting, so the
    mode's frequency is the longest run) — O(n log n) per row, no
    shuffle, instead of an explode + two aggregations."""
    s = F.array_sort(arr)
    state = F.aggregate(
        s,
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"], F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
            ).alias("best"),
        ),
    )
    return F.when(F.size(arr) == 0, F.lit(0.0)).otherwise(state["best"] / F.size(arr))


def top_token_fraction(col: Column) -> Column:
    """Fraction of tokens taken by the most frequent token (C4/Gopher
    repetition signal; high → boilerplate/spam)."""
    return F.round(_max_run_fraction(tokens(col)), 6)


def top_bigram_fraction(col: Column) -> Column:
    """Fraction of bigrams taken by the most frequent bigram."""
    return F.round(_max_run_fraction(bigrams(col)), 6)


# ----------------------------------------------------- Gopher-style stats


def mean_word_length_of(t: Column) -> Column:
    total = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    return F.round(F.when(F.size(t) == 0, F.lit(0.0)).otherwise(total / F.size(t)), 6)


def mean_word_length(col: Column) -> Column:
    return mean_word_length_of(tokens(col))


def alpha_word_fraction_of(t: Column) -> Column:
    hits = F.size(F.filter(t, lambda x: x.rlike("^[a-z]+$")))
    return F.round(F.when(F.size(t) == 0, F.lit(0.0)).otherwise(hits / F.size(t)), 6)


def alpha_word_fraction(col: Column) -> Column:
    """Fraction of tokens made purely of ASCII letters (Gopher requires
    ≥80% of words to contain at least one alphabetic char; the pure
    form is the stricter, deterministic variant)."""
    return alpha_word_fraction_of(tokens(col))


def quality_profile(df, text_col: str, id_col: str):
    """All quality signals in one pass: the token array is materialized
    ONCE behind a projection boundary, so the normalize+split regex work
    is not repeated per statistic (the same let-binding trick the
    n-gram/minhash operators use)."""
    t = F.col("__t")
    return (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("__t"))
        .select(
            id_col,
            mean_word_length_of(t).alias("mean_word_len"),
            alpha_word_fraction_of(t).alias("alpha_word_frac"),
            F.round(_max_run_fraction(t), 6).alias("top_token_frac"),
            F.round(_max_run_fraction(bigrams_of(t)), 6).alias("top_bigram_frac"),
        )
    )


def symbol_token_ratio(col: Column) -> Column:
    """(# of '#' or '…' / ellipsis marks) per token (Gopher symbol-to-
    word ratio; high → markup/boilerplate)."""
    s = F.coalesce(col, F.lit(""))
    # Count MATCHES, not removed characters: a literal '...' is one
    # ellipsis mark, not three symbols (the length-delta version
    # overcounted it 3×).
    n_sym = F.size(F.regexp_extract_all(s, F.lit(r"[#…]|\.\.\."), 0))
    t = tokens(col)
    return F.round(F.when(F.size(t) == 0, F.lit(0.0)).otherwise(n_sym / F.size(t)), 6)


# ----------------------------------------------------- threshold sweep


def threshold_sweep(df, text_col: str, thresholds: list[float]):
    """Survival curve for a quality filter: for each candidate threshold,
    how many documents and tokens survive ``alpha_word_frac >= t``.

    The tuning loop every corpus filter goes through — pick the knee of
    the doc/token survival curve instead of guessing a cutoff.

    Scale shape: ONE pass computes the score + token count per doc, a
    literal threshold array explodes to |thresholds| rows per doc, and
    map-side partial aggregation collapses each partition to at most
    |thresholds| rows before the single tiny shuffle (|thresholds|
    keys). No second scan per threshold — the naive loop would scan the
    corpus once per candidate cutoff.
    """
    t = F.col("__t")
    scored = df.select(tokens(F.col(text_col)).alias("__t")).select(
        alpha_word_fraction_of(t).alias("__score"), F.size(t).alias("__ntok")
    )
    th = F.explode(F.array(*[F.lit(float(x)) for x in thresholds])).alias("threshold")
    return (
        scored.select("__score", "__ntok", th)
        .groupBy("threshold")
        .agg(
            F.count(F.when(F.col("__score") >= F.col("threshold"), 1)).alias("n_docs"),
            F.coalesce(
                F.sum(F.when(F.col("__score") >= F.col("threshold"), F.col("__ntok"))), F.lit(0)
            ).alias("n_tokens"),
        )
        .orderBy("threshold")
    )


# ------------------------------------------------------------ PII scrubbing

# Conservative patterns valid (and identical) in Java regex and RE2.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+\d[\d().\- ]{6,}\d"

_PII_ORDER = [  # email first: an email must not be half-eaten by the phone rule
    ("email", PII_EMAIL, "[EMAIL]"),
    ("ip", PII_IPV4, "[IP]"),
    ("phone", PII_PHONE, "[PHONE]"),
]


def pii_redact(col: Column) -> Column:
    """Replace emails, IPv4 addresses and international-format phone
    numbers with typed placeholders. The anonymization-engine analogue
    for free-text columns (the reference anonymizes structured columns;
    a training-data pipeline needs the text-column equivalent)."""
    out = F.coalesce(col, F.lit(""))
    for _, pat, repl in _PII_ORDER:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-kind match counts (audit signal: how much PII a corpus slice
    carries, groupable by source/domain)."""
    s = F.coalesce(col, F.lit(""))
    return {kind: F.size(F.regexp_extract_all(s, F.lit(pat), 0)) for kind, pat, _ in _PII_ORDER}


def sql_pii_redact(c: str) -> str:
    """DuckDB twin of ``pii_redact`` (regexp_replace with 'g')."""
    out = f"coalesce({c}, '')"
    for _, pat, repl in _PII_ORDER:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


def sql_pii_counts(c: str) -> dict[str, str]:
    s = f"coalesce({c}, '')"
    return {kind: f"len(regexp_extract_all({s}, '{pat}'))" for kind, pat, _ in _PII_ORDER}
