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
    lowbit = w.bitwiseAND(-w)
    return F.when(w == 0, F.lit(_MAX_RHO)).otherwise(
        F.round(F.log2(lowbit), 0).cast("int") + F.lit(1)
    )


def hll_registers(
    df: DataFrame, key_col: str, group_cols: list[str], seed: int = DEFAULT_SEED
) -> DataFrame:
    """The sketch state: (group, register index ``__j``, max rank
    ``__m``) — at most M_REG rows per group, regardless of input size.

    This single max-aggregation is also the STREAMING form of the
    sketch: max is monotone, so maintaining this table over a stream
    (update/complete mode) keeps exactly the bounded per-group state a
    distinct-count needs; finalize with ``hll_estimate`` at read time.
    """
    h = hash64(F.col(key_col).cast("string"), seed, _SALT)
    return (
        df.select(*group_cols, h.alias("__h"))
        .select(*group_cols, (F.col("__h") % M_REG).alias("__j"), F.expr(f"__h div {M_REG}").alias("__w"))
        .select(*group_cols, "__j", _rho(F.col("__w")).alias("__rho"))
        .groupBy(*group_cols, "__j")
        .agg(F.max("__rho").alias("__m"))
    )


def hll_estimate(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Finalize register rows into per-group ``hll_est`` (4-dp)."""
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


def approx_distinct(
    df: DataFrame, key_col: str, group_cols: list[str], seed: int = DEFAULT_SEED
) -> DataFrame:
    """Per-group HLL cardinality estimate as ``hll_est`` (4-dp double).

    Two partial-aggregating groupBys: (group, register) -> max(rank),
    then group -> estimate."""
    return hll_estimate(hll_registers(df, key_col, group_cols, seed), group_cols)


def _sql_hll_regs_ctes(key_expr: str, group_expr: str, table: str, seed: int, where: str = "TRUE") -> str:
    """The hh/r/rho/regs CTE chain — the ONE rendering of the register
    construction, embedded by both sql_approx_distinct and
    sql_hll_pairwise_set_ops so the sketches cannot drift."""
    m = M_REG
    h = sql_hash64(key_expr, seed, _SALT)
    return f"""hh AS (SELECT {group_expr} AS grp, {h} AS h FROM {table} WHERE {where}),
r AS (SELECT grp, h % {m} AS j, h // {m} AS w FROM hh),
rho AS (SELECT grp, j,
               CASE WHEN w = 0 THEN {_MAX_RHO}
                    ELSE round(log2(w & (-w)))::INT + 1 END AS rho
        FROM r),
regs AS (SELECT grp, j, max(rho) AS mj FROM rho GROUP BY grp, j)"""


def _sql_hll_est_expr() -> str:
    """The small-range-corrected estimator over columns (s, present) —
    the ONE rendering, shared by every HLL oracle."""
    m = M_REG
    return (
        f"round(CASE WHEN ({_ALPHA_64 * m * m} / (s + ({m} - present))) <= {2.5 * m}"
        f"             AND ({m} - present) > 0"
        f"            THEN {m} * ln({m} / ({m} - present))"
        f"            ELSE {_ALPHA_64 * m * m} / (s + ({m} - present)) END, 4)"
    )


def sql_approx_distinct(key_expr: str, group_expr: str, table: str, seed: int = DEFAULT_SEED) -> str:
    """DuckDB twin: identical registers, ranks, and estimator."""
    return f"""
WITH {_sql_hll_regs_ctes(key_expr, group_expr, table, seed)},
agg AS (SELECT grp, sum(pow(2.0, -mj)) AS s, count(*) AS present FROM regs GROUP BY grp)
SELECT grp, {_sql_hll_est_expr()} AS hll_est
FROM agg
"""


def hll_pairwise_set_ops(
    df: DataFrame, key_col: str, group_col: str, seed: int = DEFAULT_SEED
) -> DataFrame:
    """HLL set ALGEBRA — the reason sketches beat exact distinct at
    100 TB is not the single count but the mergeability: register-wise
    max of two groups' registers IS the sketch of their union, so
    audience overlap between every pair of groups costs two
    register-table joins over <= M_REG rows per group — never a
    raw-key shuffle, never an exact distinct self-join.

    Returns one row per unordered group pair (group_a < group_b):
    (group_a, group_b, est_a, est_b, est_union, est_inter, jaccard)
    with est_inter = est_a + est_b - est_union (inclusion-exclusion;
    can be slightly negative at sketch error, reported raw) and
    jaccard = clamp(est_inter, 0, est_union) / est_union, over the
    4-dp rounded estimates so the DuckDB twin replays them
    bit-for-bit. The upper clamp matters because the small-range
    correction can make est_union locally non-monotone vs the single
    estimates — without it a near-identical pair could report a
    Jaccard above 1.

    NULL group keys are dropped (no group -> no audience), matching
    the twin's equi-joins and < comparison which drop NULLs
    structurally.

    Scale shape: the register build is the same bounded-state
    aggregation as ``approx_distinct``; the pair fan-out joins the
    TINY distinct-group table with the register table (broadcast), and
    the union merge is a map-side-combinable max over
    (pair, register) — state is |pairs| x M_REG rows total.
    """
    df = df.filter(F.col(group_col).isNotNull())
    regs = hll_registers(df, key_col, [group_col], seed)
    types = regs.select(F.col(group_col).alias("ga")).distinct()
    pairs = types.crossJoin(F.broadcast(types.select(F.col("ga").alias("gb")))).filter(
        F.col("ga") < F.col("gb")
    )
    ra = regs.select(F.col(group_col).alias("ga"), "__j", "__m")
    rb = regs.select(F.col(group_col).alias("gb"), "__j", "__m")
    ureg = (
        pairs.join(ra, "ga")
        .select("ga", "gb", "__j", "__m")
        .unionByName(pairs.join(rb, "gb").select("ga", "gb", "__j", "__m"))
        .groupBy("ga", "gb", "__j")
        .agg(F.max("__m").alias("__m"))
    )
    uest = hll_estimate(ureg, ["ga", "gb"]).withColumnRenamed("hll_est", "est_union")
    singles = hll_estimate(regs, [group_col])
    inter = F.round(F.col("est_a") + F.col("est_b") - F.col("est_union"), 4)
    return (
        uest.join(
            singles.select(F.col(group_col).alias("ga"), F.col("hll_est").alias("est_a")), "ga"
        )
        .join(
            singles.select(F.col(group_col).alias("gb"), F.col("hll_est").alias("est_b")), "gb"
        )
        .select(
            F.col("ga").alias("group_a"),
            F.col("gb").alias("group_b"),
            "est_a",
            "est_b",
            "est_union",
            inter.alias("est_inter"),
            F.round(
                F.least(F.greatest(inter, F.lit(0.0)) / F.col("est_union"), F.lit(1.0)), 4
            ).alias("jaccard"),
        )
    )


def sql_hll_pairwise_set_ops(
    key_expr: str, group_expr: str, table: str, seed: int = DEFAULT_SEED
) -> str:
    """DuckDB twin of ``hll_pairwise_set_ops``: the SHARED register
    chain and estimator (``_sql_hll_regs_ctes`` / ``_sql_hll_est_expr``
    — the same renderings sql_approx_distinct embeds, so hll_users and
    hll_set_ops cannot drift), applied to the single and the
    register-max-merged union sketches."""
    est = _sql_hll_est_expr()
    return f"""
WITH {_sql_hll_regs_ctes(key_expr, group_expr, table, seed, where=f"{group_expr} IS NOT NULL")},
singles AS (
  SELECT grp, {est} AS hll_est
  FROM (SELECT grp, sum(pow(2.0, -mj)) AS s, count(*) AS present FROM regs GROUP BY grp)
),
pairs AS (
  SELECT a.grp AS ga, b.grp AS gb
  FROM (SELECT DISTINCT grp FROM regs) a, (SELECT DISTINCT grp FROM regs) b
  WHERE a.grp < b.grp
),
ureg AS (
  SELECT ga, gb, j, max(mj) AS mj FROM (
    SELECT p.ga, p.gb, r1.j, r1.mj FROM pairs p JOIN regs r1 ON r1.grp = p.ga
    UNION ALL
    SELECT p.ga, p.gb, r2.j, r2.mj FROM pairs p JOIN regs r2 ON r2.grp = p.gb
  ) GROUP BY ga, gb, j
),
uest AS (
  SELECT ga, gb, {est} AS est_union
  FROM (SELECT ga, gb, sum(pow(2.0, -mj)) AS s, count(*) AS present
        FROM ureg GROUP BY ga, gb)
)
SELECT u.ga AS group_a, u.gb AS group_b,
       sa.hll_est AS est_a, sb.hll_est AS est_b, u.est_union,
       round(sa.hll_est + sb.hll_est - u.est_union, 4) AS est_inter,
       round(least(greatest(round(sa.hll_est + sb.hll_est - u.est_union, 4), 0.0) / u.est_union, 1.0), 4) AS jaccard
FROM uest u JOIN singles sa ON sa.grp = u.ga JOIN singles sb ON sb.grp = u.gb
"""


# ----------------------------------------------------------------- count-min
#
# Count-min sketch (Cormode & Muthukrishnan): d independent hash rows of
# w counters; est(key) = min_r cell[r][h_r(key)] >= true count, with
# overestimate bounded by e*N/w at confidence 1 - e^-d. Like the HLL
# above, the hashes are engine-portable md5 arithmetic, so every counter
# — and therefore every estimate — is oracle-checkable bit-for-bit.
#
# Scale shape: the build is ONE map-side-combinable groupBy of
# (row, bucket) — d*w cells of state total, independent of input size.
# The d-way per-input-row expansion happens inside the partial
# aggregate, so nothing raw is shuffled.

CM_DEPTH = 4
CM_WIDTH = 256
_CM_SALT = "cm"


def _cm_bucket(key: Column, r: int, seed: int, width: int) -> Column:
    return hash64(key, seed, f"{_CM_SALT}{r}") % width


def countmin_build(
    df: DataFrame,
    key_col: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """Count-min table as (r, bucket, cnt) — d*w rows, broadcastable."""
    k = F.col(key_col).cast("string")
    cells = F.array(
        *[
            F.struct(F.lit(r).alias("r"), _cm_bucket(k, r, seed, width).alias("bucket"))
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.r").alias("r"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def countmin_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key_col: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """Point-estimate each key against a built sketch: (key, cm_est).

    The sketch side is d*w rows — broadcast; the probe is one scan of
    ``keys`` with no shuffle beyond the final per-key min (map-side
    combinable, one row per key per hash row)."""
    k = F.col(key_col).cast("string")
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(r).alias("r"), _cm_bucket(k, r, seed, width).alias("bucket"))
                    for r in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, F.col("c.r").alias("r"), F.col("c.bucket").alias("bucket"))
    # LEFT join + coalesce(0): a probe key absent from the build set has
    # untouched cells (no sketch row) and must estimate 0, not vanish
    # from the output (and a partial match must min over 0, not only
    # over the cells other keys happened to touch).
    return (
        probes.join(F.broadcast(sketch), ["r", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cm_est"))
    )


def sql_countmin_heavy_hitters(
    key_expr: str,
    table: str,
    threshold: int,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
    seed: int = DEFAULT_SEED,
) -> str:
    """DuckDB twin of build + distinct-key probe + threshold filter."""
    bucket_cases = " UNION ALL ".join(
        f"SELECT {r} AS r, ({sql_hash64(key_expr, seed, f'{_CM_SALT}{r}')}) % {width} AS bucket, k "
        f"FROM (SELECT ({key_expr})::VARCHAR AS k, {key_expr} FROM {table})"
        for r in range(depth)
    )
    return f"""
WITH cells AS ({bucket_cases}),
sketch AS (SELECT r, bucket, count(*) AS cnt FROM cells GROUP BY 1, 2),
probe AS (SELECT DISTINCT r, bucket, k FROM cells),
est AS (
  SELECT p.k, min(s.cnt) AS cm_est
  FROM probe p JOIN sketch s ON s.r = p.r AND s.bucket = p.bucket
  GROUP BY p.k
)
SELECT k, cm_est FROM est WHERE cm_est >= {threshold}
"""


# -------------------------------------------------------------- bloom filter
#
# Deterministic k-hash bloom filter over an m-bit array stored as
# m/32 words (32 payload bits per BIGINT — bit 63 stays clear because
# DuckDB's left shift refuses 1 << 63) (bit_or-aggregated — bounded state, broadcastable).
# No false negatives ever; false-positive rate ~ (1 - e^{-kn/m})^k.
# Use-case at 100 TB: build on the small side's join key, probe the big
# side at scan time to drop rows that cannot match — a semi-join
# without shuffling the big side.

BF_BITS = 4096          # must be a multiple of 64
BF_HASHES = 5
_BF_SALT = "bf"


def _bf_positions(key: Column, k: int, m: int, seed: int) -> list[Column]:
    return [hash64(key, seed, f"{_BF_SALT}{i}") % m for i in range(k)]


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = BF_BITS,
    k_hashes: int = BF_HASHES,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """Bitmap as (word, bits) rows — at most m/32 of them."""
    key = F.col(key_col).cast("string")
    pos = F.explode(F.array(*_bf_positions(key, k_hashes, m_bits, seed))).alias("p")
    return (
        df.select(pos)
        .select((F.col("p") / 32).cast("long").alias("word"),
                F.expr("shiftleft(1L, int(p % 32))").alias("mask"))
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    probe: DataFrame,
    bitmap: DataFrame,
    key_col: str,
    m_bits: int = BF_BITS,
    k_hashes: int = BF_HASHES,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """Adds ``bf_maybe`` (boolean): false ⇒ key definitely not in the
    build set. Bitmap side is ≤ m/32 rows — broadcast join; the probe
    side is never shuffled (the per-key all-bits conjunction groups on
    the probe's own key, map-side combinable)."""
    key = F.col(key_col).cast("string")
    pk = probe.select(
        F.col(key_col),
        F.explode(F.array(*_bf_positions(key, k_hashes, m_bits, seed))).alias("p"),
    ).select(
        key_col,
        (F.col("p") / 32).cast("long").alias("word"),
        F.expr("shiftleft(1L, int(p % 32))").alias("mask"),
    )
    hit = (
        pk.join(F.broadcast(bitmap), "word", "left")
        .withColumn("__ok", (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask"))) == F.col("mask"))
        .groupBy(key_col)
        .agg(F.min("__ok").alias("bf_maybe"))
    )
    return probe.join(hit, key_col)


def sql_bloom_probe(
    build_key: str,
    build_table: str,
    probe_key: str,
    probe_table: str,
    m_bits: int = BF_BITS,
    k_hashes: int = BF_HASHES,
    seed: int = DEFAULT_SEED,
) -> str:
    """DuckDB twin: bitmap CTE + per-probe-key conjunction, as
    (probe_key, bf_maybe)."""
    build_pos = " UNION ALL ".join(
        f"SELECT ({sql_hash64(build_key, seed, f'{_BF_SALT}{i}')}) % {m_bits} AS p FROM {build_table}"
        for i in range(k_hashes)
    )
    probe_pos = " UNION ALL ".join(
        f"SELECT {probe_key} AS k, ({sql_hash64(probe_key, seed, f'{_BF_SALT}{i}')}) % {m_bits} AS p FROM {probe_table}"
        for i in range(k_hashes)
    )
    return f"""
WITH bpos AS ({build_pos}),
bitmap AS (SELECT p // 32 AS word, bit_or(1::BIGINT << (p % 32)::INT) AS bits
           FROM bpos GROUP BY 1),
ppos AS ({probe_pos}),
hit AS (
  SELECT ppos.k,
         min((coalesce(bitmap.bits, 0) & (1::BIGINT << (ppos.p % 32)::INT))
             = (1::BIGINT << (ppos.p % 32)::INT)) AS bf_maybe
  FROM ppos LEFT JOIN bitmap ON bitmap.word = ppos.p // 32
  GROUP BY ppos.k
)
SELECT k, bf_maybe FROM hit
"""


# ---------------------------------------------------------------------------
# Mergeable log-bucket quantile sketch
# ---------------------------------------------------------------------------
#
# The missing member of the sketch family (HLL = distinct, count-min =
# frequency, bloom = membership): bounded-error QUANTILES that merge
# algebraically. Exact percentiles need a per-group sort and cannot
# stream or pre-aggregate; this sketch buckets values into
# QS_SUB sub-buckets per power-of-two octave (relative bucket width
# ≤ 1/QS_SUB), so per-partition/per-day partial counts combine by
# ADDITION and the quantile estimate is read off the merged counts —
# the DDSketch/HDR-histogram design, on integer-exact arithmetic so
# the DuckDB oracle replays it bit-for-bit (no float log2 anywhere;
# same discipline as streaming.windows.value_histogram).

QS_SUB = 8  # sub-buckets per octave → ≤ 12.5% relative error
QS_SCALE = 256  # fixed-point value quantization (1/256 resolution)


def qs_bucket(value: Column) -> Column:
    """Integer bucket id of a non-negative value.

    octave = binary length of the fixed-point value (exact via base-2
    string length, no float log2); sub-bucket = linear position within
    the octave. The only division is by a power of two (exact in
    binary FP), so Spark and DuckDB agree on every boundary.

    Negative inputs CLAMP to the zero bucket (a negative iv would
    two's-complement through conv/bin into a garbage top bucket that
    both engines would agree on — silently wrong beats loudly wrong
    only when it's visible, so the clamp is part of the contract:
    signed metrics must be shifted or abs'd by the caller)."""
    iv = F.floor(F.greatest(value, F.lit(0)) * QS_SCALE).cast("long") + 1  # iv >= 1
    bl = F.length(F.conv(iv, 10, 2))  # binary length (integer-exact)
    p = F.pow(F.lit(2.0), bl - 1)  # 2^(octave), exact ≤ 2^53
    sub = F.floor((iv - p) * QS_SUB / p)
    return ((bl - 1) * QS_SUB + sub).cast("long")


def qs_upper(bucket: Column) -> Column:
    """Upper value edge of a bucket (the quantile estimate), 6-dp."""
    octave = F.floor(bucket / QS_SUB)
    sub = bucket % QS_SUB
    iv_hi = F.pow(F.lit(2.0), octave) * (1 + (sub + 1) / F.lit(float(QS_SUB)))
    return F.round((iv_hi - 1) / QS_SCALE, 6)


def quantile_bucket_counts(df: DataFrame, value_col: str, group_cols: list[str]) -> DataFrame:
    """The sketch state: per-(group, bucket) counts — the SAME
    expression runs over ``readStream`` in complete/update mode (state
    bounded by #groups × #buckets, like ``windows.value_histogram``),
    and per-shard/day partials merge by summing ``__n``. Quantile
    extraction (``quantiles_from_counts``) is a cheap finalize over
    the merged counts. NULL values are excluded (matching
    ``percentile()``'s semantics — and a NULL bucket would order
    NULLS FIRST in Spark but NULLS LAST in DuckDB, silently skewing
    every cumulative crossing on dirty data)."""
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, qs_bucket(F.col(value_col)).alias("__b"))
        .agg(F.count(F.lit(1)).alias("__n"))
    )


def quantile_sketch(df: DataFrame, value_col: str, group_cols: list[str]) -> DataFrame:
    """Per-group p50/p90/p99 estimates from the mergeable sketch.

    One bucket-count shuffle (map-side partials collapse each
    partition to ≤ #groups × #buckets rows), a bucket-ordered
    cumulative window over the tiny per-group bucket series, and the
    estimate = upper edge of the first bucket whose cumulative count
    crosses q·n — the crossing test is cum·den ≥ num·n in INTEGERS,
    so no float threshold can disagree between engines. At 100 TB the
    same bucket counts roll up per shard/day and merge by addition —
    that mergeability is the point of the sketch."""
    return quantiles_from_counts(quantile_bucket_counts(df, value_col, group_cols), group_cols)


def quantiles_from_counts(counts: DataFrame, group_cols: list[str]) -> DataFrame:
    """Finalize (group, __b, __n) sketch state into quantile estimates."""
    from pyspark.sql import Window
    wc = Window.partitionBy(*group_cols).orderBy("__b").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy(*group_cols)
    c = counts.withColumn("__cum", F.sum("__n").over(wc)).withColumn(
        "__tot", F.sum("__n").over(wt)
    )
    up = qs_upper(F.col("__b"))
    return (
        c.groupBy(*group_cols)
        .agg(
            F.max("__tot").alias("n"),
            F.min(F.when(F.col("__cum") * 2 >= F.col("__tot"), up)).alias("p50_est"),
            F.min(F.when(F.col("__cum") * 10 >= 9 * F.col("__tot"), up)).alias("p90_est"),
            F.min(F.when(F.col("__cum") * 100 >= 99 * F.col("__tot"), up)).alias("p99_est"),
        )
        .orderBy(*group_cols)
    )


def sql_quantile_sketch(value_expr: str, group_expr: str, table: str) -> str:
    """DuckDB twin: identical fixed-point buckets (incl. the NULL
    filter and negative clamp), crossings, and edges. ``group_expr``
    must be a plain column name — it is also the output column name."""
    s, k = QS_SUB, QS_SCALE
    return f"""
WITH iv AS (
  SELECT {group_expr} AS grp,
         floor(greatest({value_expr}, 0) * {k})::BIGINT + 1 AS iv
  FROM {table} WHERE {value_expr} IS NOT NULL
),
bk AS (
  SELECT grp,
         (length(bin(iv)) - 1) * {s}
           + floor((iv - 2.0 ^ (length(bin(iv)) - 1)) * {s} / 2.0 ^ (length(bin(iv)) - 1))
           AS b
  FROM iv
),
c AS (SELECT grp, b, count(*) AS n FROM bk GROUP BY 1, 2),
cum AS (
  SELECT grp, b, n,
         sum(n) OVER (PARTITION BY grp ORDER BY b ROWS UNBOUNDED PRECEDING) AS cumn,
         sum(n) OVER (PARTITION BY grp) AS tot,
         round((2.0 ^ floor(b / {s}) * (1 + (b % {s} + 1) / {float(s)}) - 1) / {k}, 6) AS up
  FROM c
)
SELECT grp AS {group_expr}, max(tot)::BIGINT AS n,
       min(CASE WHEN cumn * 2 >= tot THEN up END) AS p50_est,
       min(CASE WHEN cumn * 10 >= 9 * tot THEN up END) AS p90_est,
       min(CASE WHEN cumn * 100 >= 99 * tot THEN up END) AS p99_est
FROM cum GROUP BY grp ORDER BY grp
"""
