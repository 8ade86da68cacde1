"""Deterministic cardinality sketches (north-star extension).

``approx_count_distinct`` (Spark) and ``approx_count_distinct``
(DuckDB) are both HyperLogLog but hash differently, so their estimates
can never be cross-checked value-for-value. This module implements a
small, REGISTER-EXACT HLL from the engine's own md5 primitive: every
intermediate (register index, rank, register maximum) is integer
arithmetic that Spark and DuckDB compute identically, so the final
estimate matches bit-for-bit after 4-dp rounding — the sketch itself
becomes oracle-checkable, not just tolerance-tested.

Layout (m = 64 registers):
    h   = 60-bit md5 hash of the key        (functions.hashing.hash64)
    j   = h mod 64                          (register index)
    w   = h div 64                          (54 payload bits)
    rho = index of lowest set bit of w, 1-based; 55 when w = 0
          (computed as round(log2(w & -w)) + 1 — w & -w isolates the
          lowest set bit, an exact power of two, so log2 is exact and
          round() guards against sub-ulp libm noise)

Estimator: alpha_64 * m^2 / sum_j 2^(-M_j), with the standard
small-range correction m * ln(m/V) when est <= 2.5m and V (empty
registers) > 0. Empty registers contribute 2^0 = 1 to the sum.

At 100 TB this is ONE map-side-combinable groupBy of (group, j) —
64 rows of state per group, no shuffle of raw keys beyond the partial
aggregate. The relative error of m=64 is ~13%; bump M_REG for more
(the construction is parametric, the SQL twin renders any m).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rustic_witcher_spark.functions.hashing import hash64, sql_hash64
from rustic_witcher_spark.functions.wordlists import DEFAULT_SEED

M_REG = 64          # registers; must be a power of two
_ALPHA_64 = 0.709   # standard HLL bias constant for m = 64
_MAX_RHO = 55       # 54 payload bits -> rho in [1, 54], 55 when w = 0
_SALT = "hll"


def _rho(w: Column) -> Column:
    lowbit = F.expr("__w & -__w")
    return F.when(w == 0, F.lit(_MAX_RHO)).otherwise(
        F.round(F.log2(lowbit), 0).cast("int") + F.lit(1)
    )


def approx_distinct(
    df: DataFrame, key_col: str, group_cols: list[str], seed: int = DEFAULT_SEED
) -> DataFrame:
    """Per-group HLL cardinality estimate as ``hll_est`` (4-dp double).

    Two partial-aggregating groupBys: (group, register) -> max(rank),
    then group -> estimate. State per group is bounded by M_REG rows
    regardless of input size.
    """
    h = hash64(F.col(key_col).cast("string"), seed, _SALT)
    regs = (
        df.select(*group_cols, h.alias("__h"))
        .select(*group_cols, (F.col("__h") % M_REG).alias("__j"), F.expr(f"__h div {M_REG}").alias("__w"))
        .select(*group_cols, "__j", _rho(F.col("__w")).alias("__rho"))
        .groupBy(*group_cols, "__j")
        .agg(F.max("__rho").alias("__m"))
    )
    m = float(M_REG)
    agg = regs.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("__m"))).alias("__s"),
        F.count("*").alias("__present"),
    )
    # empty registers: 2^-0 = 1 each; V of them
    v = F.lit(m) - F.col("__present")
    raw = F.lit(_ALPHA_64 * m * m) / (F.col("__s") + v)
    est = F.when((raw <= 2.5 * m) & (v > 0), F.lit(m) * F.log(F.lit(m) / v)).otherwise(raw)
    return agg.select(*group_cols, F.round(est, 4).alias("hll_est"))


def sql_approx_distinct(key_expr: str, group_expr: str, table: str, seed: int = DEFAULT_SEED) -> str:
    """DuckDB twin: identical registers, ranks, and estimator."""
    m = M_REG
    h = sql_hash64(key_expr, seed, _SALT)
    return f"""
WITH hh AS (SELECT {group_expr} AS grp, {h} AS h FROM {table}),
r AS (SELECT grp, h % {m} AS j, h // {m} AS w FROM hh),
rho AS (SELECT grp, j,
               CASE WHEN w = 0 THEN {_MAX_RHO}
                    ELSE round(log2(w & (-w)))::INT + 1 END AS rho
        FROM r),
regs AS (SELECT grp, j, max(rho) AS mj FROM rho GROUP BY grp, j),
agg AS (SELECT grp, sum(pow(2.0, -mj)) AS s, count(*) AS present FROM regs GROUP BY grp)
SELECT grp,
       round(CASE WHEN ({_ALPHA_64 * m * m} / (s + ({m} - present))) <= {2.5 * m}
                   AND ({m} - present) > 0
                  THEN {m} * ln({m} / ({m} - present))
                  ELSE {_ALPHA_64 * m * m} / (s + ({m} - present)) END, 4) AS hll_est
FROM agg
"""
