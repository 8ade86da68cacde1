"""Deterministic sampling operators for training-data pipelines
(north-star extension).

Mixture resampling — "keep 30% of language X, 100% of language Y" — is
the workhorse of pretraining-data curation. Spark's built-in
``sampleBy`` draws from a partition-local RNG, so results change with
partitioning, retries, and cluster size; these operators instead
threshold the engine's deterministic md5 hash of the row key:

    keep  ⇔  uniform01(hash(seed, id)) < fraction(class)

which is (a) exactly reproducible across runs/partitionings/engines
(DuckDB oracle renders the same arithmetic), (b) a pure scan-side
predicate — no shuffle, pushes through column pruning, and (c) stable
under incremental reprocessing: a row's keep/drop fate never changes
when the corpus around it grows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rustic_witcher_spark.functions.hashing import hash_slice, md5_hex, sql_hash_slice, sql_md5_hex
from rustic_witcher_spark.functions.wordlists import DEFAULT_SEED

_DENOM = float(2**32)


def uniform01(key: Column, seed: int = DEFAULT_SEED, salt: str = "sample") -> Column:
    """Deterministic uniform [0,1) draw per key value."""
    return hash_slice(md5_hex(key.cast("string"), seed, salt), 1) / F.lit(_DENOM)


def sql_uniform01(key_expr: str, seed: int = DEFAULT_SEED, salt: str = "sample") -> str:
    return f"({sql_hash_slice(sql_md5_hex(key_expr, seed, salt), 1)} / {_DENOM})"


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, seed: int = DEFAULT_SEED
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided per-key by hash threshold."""
    return df.filter(uniform01(F.col(key_col), seed) < fraction)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    class_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """Per-class keep fractions (mixture resampling). Classes absent
    from ``fractions`` fall back to ``default_fraction`` (0.0 = drop —
    an explicit allowlist, the safe default for curation)."""
    thresh: Column = F.lit(float(default_fraction))
    for cls, frac in sorted(fractions.items()):
        thresh = F.when(F.col(class_col) == cls, F.lit(float(frac))).otherwise(thresh)
    return df.filter(uniform01(F.col(key_col), seed) < thresh)


def sql_stratified_sample_predicate(
    key_expr: str,
    class_expr: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = DEFAULT_SEED,
) -> str:
    """DuckDB twin of the stratified keep-predicate."""
    branches = " ".join(
        f"WHEN {class_expr} = '{cls}' THEN {float(frac)}" for cls, frac in sorted(fractions.items())
    )
    case = f"(CASE {branches} ELSE {float(default_fraction)} END)"
    return f"{sql_uniform01(key_expr, seed)} < {case}"


# --------------------------------------------------- weighted sampling (A-ES)

_WSAMPLE_SALT = "wsample"


def weighted_sample_key(key_col: Column, weight_col: Column, seed: int = DEFAULT_SEED) -> Column:
    """A-ES (Efraimidis–Spirakis) sort key: ln(u)/w, u deterministic per key.

    Ranking rows by this key DESCENDING and keeping the top k draws a
    weighted sample without replacement: P(row i in sample) follows the
    successive-sampling distribution with inclusion odds proportional
    to w_i. ln(u)/w is the log of the classic u^(1/w) key, monotone in
    it, and avoids pow() — one fewer libm call whose rounding could
    differ across engines.
    """
    # greatest(u, 2^-64): uniform01 is an 8-hex-digit draw, so u = 0
    # occurs with probability 2^-32 per key — Spark's log would yield
    # NULL there while DuckDB's ln(0) hard-errors and aborts the whole
    # oracle query. Clamping to 2^-64 (below any nonzero draw) keeps
    # both engines on the same finite key.
    u = F.greatest(uniform01(key_col, seed, _WSAMPLE_SALT), F.lit(2.0**-64))
    return F.log(u) / weight_col.cast("double")


def weighted_sample_topk(
    df: DataFrame, key_col: str, weight_col: str, k: int, seed: int = DEFAULT_SEED
) -> DataFrame:
    """Weighted sample-without-replacement of ``k`` rows.

    Distributed shape: orderBy(key).limit(k) compiles to
    TakeOrderedAndProject — each partition keeps its local top-k and
    the driver merges k-sized heaps. No global sort, no shuffle of the
    data; the only cross-executor traffic is num_partitions·k rows.
    Rows with non-positive weight are excluded (their key is undefined),
    matching the A-ES convention that w must be > 0.
    """
    key = weighted_sample_key(F.col(key_col), F.col(weight_col), seed)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__wkey", key)
        .orderBy(F.col("__wkey").desc(), F.col(key_col).asc())
        .limit(k)
        .drop("__wkey")
    )


def sql_weighted_sample_key(key_expr: str, weight_expr: str, seed: int = DEFAULT_SEED) -> str:
    """DuckDB twin of ``weighted_sample_key`` (same 2^-64 clamp)."""
    u = f"greatest({sql_uniform01(key_expr, seed, _WSAMPLE_SALT)}, {2.0**-64!r})"
    return f"(ln({u}) / ({weight_expr})::DOUBLE)"


def group_split(
    group_col: Column,
    seed: int = DEFAULT_SEED,
    buckets: int = 10,
    train_buckets: int = 8,
) -> Column:
    """Leakage-safe split label ('train'/'val'/'test') as a pure
    function of the GROUP key (source/domain): every row of a group
    lands in the same split, so near-duplicates inside a group can't
    straddle train and eval. Default 8/1/1 over 10 hash buckets.

    Deterministic md5-derived hash (the engine's standard primitive) —
    re-running on a grown corpus keeps every existing group's
    assignment stable, which is what makes incremental corpus refreshes
    safe against silent eval contamination."""
    from rustic_witcher_spark.functions.hashing import hash64

    bucket = F.pmod(hash64(group_col, seed, "split"), F.lit(buckets))
    return (
        F.when(bucket < train_buckets, "train")
        .when(bucket == train_buckets, "val")
        .otherwise("test")
    )
