"""Mixture construction for pretraining corpora (north-star extension).

Data mixing — "the training set should be 50% English, 20% Chinese, …
by token mass" — is the step between curation and packing in every
large-scale pipeline. Given target SHARES per stratum and a total
token/char BUDGET, the operator computes each stratum's keep fraction

    frac_s = min(1, share_s * budget / available_s)

(capped at 1: a stratum cannot contribute more than it has — the
standard "epochs <= 1" mixing rule) and then keeps each row by the
engine's deterministic hash threshold, ``uniform01(key) < frac_s``.

Scale shape: ``available_s`` is one map-side-combinable groupBy over
the stratum column (|strata| rows of state); the fractions join back
via BROADCAST; the keep decision is a scan-side predicate. Nothing
about the decision depends on partitioning or cluster size, so the
same corpus + config always yields the same mixture — and the DuckDB
oracle replays it exactly (integer sums, one double division, same
md5 threshold arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rustic_witcher_spark.functions.wordlists import DEFAULT_SEED
from rustic_witcher_spark.operators.sampling import sql_uniform01, uniform01

_SALT = "mix"


def _share_expr(stratum_col: str, shares: dict[str, float]):
    """Per-row target share as a Column CASE over sorted strata (0.0
    for strata outside the allowlist) — shared by both Spark variants."""
    share = F.lit(0.0)
    for s, p in sorted(shares.items()):
        share = F.when(F.col(stratum_col) == s, F.lit(float(p))).otherwise(share)
    return share


def _sql_share_case(stratum_expr: str, shares: dict[str, float]) -> str:
    """DuckDB twin of ``_share_expr``."""
    branches = " ".join(
        f"WHEN {stratum_expr} = '{s}' THEN {float(p)}" for s, p in sorted(shares.items())
    )
    return f"(CASE {branches} ELSE 0.0 END)"


def mixture_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    weight_col: str,
    shares: dict[str, float],
    budget: float,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """Deterministic mixture sample: keeps rows so each stratum's kept
    weight approaches ``share * budget``. Strata absent from ``shares``
    are dropped (explicit allowlist).

    coalesce(try_divide(...), 0): a stratum whose available weight
    sums to 0 (all its rows weightless) has an ill-defined keep
    fraction — it keeps NOTHING. The naked division killed ANSI Spark
    jobs (dirty-corpus fuzz, r9), and a bare try_divide is NOT enough:
    least() SKIPS NULL arguments in both engines, so NULL frac would
    collapse to least(1.0, NULL) = 1.0 and keep EVERYTHING — including
    zero-weight strata outside the shares allowlist (0/0 → NULL) —
    inverting the documented semantics (review finding, r9). The twin
    coalesces identically."""
    avail = df.groupBy(stratum_col).agg(F.sum(weight_col).alias("__avail"))
    frac = F.least(
        F.lit(1.0),
        F.coalesce(
            F.try_divide(
                _share_expr(stratum_col, shares) * F.lit(float(budget)), F.col("__avail")
            ),
            F.lit(0.0),
        ),
    )
    return (
        df.join(F.broadcast(avail), stratum_col)
        .filter(uniform01(F.col(key_col), seed, _SALT) < frac)
        .drop("__avail")
    )


def mixture_sample_relative(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    weight_col: str,
    shares: dict[str, float],
    budget_frac: float,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """Like ``mixture_sample`` but the budget is ``budget_frac`` of the
    corpus's TOTAL weight, computed in-plan (broadcast scalar — no
    driver collect), so one config scales across corpus sizes."""
    avail = df.groupBy(stratum_col).agg(F.sum(weight_col).alias("__avail"))
    total = df.agg(F.sum(weight_col).alias("__total"))
    # coalesce(try_divide, 0): zero-weight stratum keeps nothing —
    # least() skips NULLs, so a bare NULL frac would invert to 1.0
    # (see mixture_sample)
    frac = F.least(
        F.lit(1.0),
        F.coalesce(
            F.try_divide(
                _share_expr(stratum_col, shares) * F.lit(float(budget_frac)) * F.col("__total"),
                F.col("__avail"),
            ),
            F.lit(0.0),
        ),
    )
    return (
        df.join(F.broadcast(avail), stratum_col)
        .crossJoin(F.broadcast(total))
        .filter(uniform01(F.col(key_col), seed, _SALT) < frac)
        .drop("__avail", "__total")
    )


def sql_mixture_sample_relative(
    key_expr: str,
    stratum_expr: str,
    weight_expr: str,
    table: str,
    shares: dict[str, float],
    budget_frac: float,
    select: str,
    seed: int = DEFAULT_SEED,
) -> str:
    """DuckDB twin of ``mixture_sample_relative``."""
    return f"""
WITH avail AS (SELECT {stratum_expr} AS strat, sum({weight_expr}) AS av FROM {table} GROUP BY 1),
tot AS (SELECT sum({weight_expr}) AS total FROM {table}),
j AS (SELECT t.*, a.av, tot.total FROM {table} t
      JOIN avail a ON a.strat = t.{stratum_expr} CROSS JOIN tot)
SELECT {select} FROM j
WHERE {sql_uniform01(key_expr, seed, _SALT)}
      < least(1.0, coalesce({_sql_share_case(stratum_expr, shares)} * {float(budget_frac)} * total / nullif(av, 0), 0.0))
"""


def sql_mixture_sample(
    key_expr: str,
    stratum_expr: str,
    weight_expr: str,
    table: str,
    shares: dict[str, float],
    budget: float,
    select: str,
    seed: int = DEFAULT_SEED,
) -> str:
    """DuckDB twin; ``select`` is the output column list."""
    return f"""
WITH avail AS (SELECT {stratum_expr} AS strat, sum({weight_expr}) AS av FROM {table} GROUP BY 1),
j AS (SELECT t.*, a.av FROM {table} t JOIN avail a ON a.strat = t.{stratum_expr})
SELECT {select} FROM j
WHERE {sql_uniform01(key_expr, seed, _SALT)}
      < least(1.0, coalesce({_sql_share_case(stratum_expr, shares)} * {float(budget)} / nullif(av, 0), 0.0))
"""
