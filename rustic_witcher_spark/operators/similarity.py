"""Similarity search over embedding columns (north-star extension).

Brute-force cosine top-k is the correctness baseline; the LSH-bucketed
variant is the 100 TB path (candidate generation via random-hyperplane
signatures → bucket join → exact re-rank within buckets, so the
cross-product never materializes corpus × queries).

All vector math is built-in expressions (zip_with / aggregate), double
precision, deterministic fold order — so a DuckDB oracle can reproduce
the scores bit-for-bit after rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from rustic_witcher_spark.functions.wordlists import DEFAULT_SEED


def dot(a: Column, b: Column) -> Column:
    """Σ a_i · b_i as a sequential left fold (deterministic order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")), F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x.cast("double") * x.cast("double")), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    # try_divide: a zero-norm vector makes the denominator 0 — ANSI
    # Spark would throw where DuckDB yields NULL; NULL here means "no
    # similarity defined" and every consumer drops it before ranking
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def _round_half_away(x, decimals: int = 6):
    """Round like Spark ``F.round`` / DuckDB ``round`` (half AWAY from
    zero) — ``np.round`` is banker's (half-to-even) and disagrees with
    both engines on exact .5 boundary values, which would let a block
    kernel drift from its oracle-pinned HOF twin on adversarial
    inputs."""
    import numpy as np

    f = 10.0 ** decimals
    return np.copysign(np.floor(np.abs(x) * f + 0.5), x) / f


def plane_weight(seed: int, plane: int, coord: int) -> int:
    """Deterministic ±1 hyperplane weight — shared by the Spark
    expression builder and the DuckDB oracle generator."""
    import hashlib

    h = hashlib.md5(f"{seed}|hp|{plane}|{coord}".encode()).hexdigest()
    return 1 if int(h[:8], 16) % 2 == 0 else -1


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    Plan shape: broadcast the (small) query set against the corpus —
    a broadcast nested-loop that scans the corpus ONCE regardless of
    query count — then a per-query top-k window. Ties broken by
    neighbor id for determinism.

    Returns (query_id, neighbor_id, sim, rank); self-matches excluded.

    NULL vectors are DROPPED on both sides: a row without an embedding
    has no place in a similarity search — left in, its sim is NaN and
    Spark's NaN-is-greatest ordering ranks it ABOVE every real
    neighbor, silently burning top-k slots (r9 dirty-corpus fuzz).
    """
    corpus = corpus.filter(F.col(vec_col).isNotNull())
    queries = queries.filter(F.col(vec_col).isNotNull())
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("sim"))
        # zero-norm vectors: cosine is 0/0 — NaN here, NULL in the
        # DuckDB twins; both mean "no similarity defined", so the row
        # drops before ranking (the block kernels' keep_q discipline)
        .filter(F.col("sim").isNotNull() & ~F.isnan(F.col("sim")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


_PAIR_SCHEMA_DDL = "id_a long, id_b long, sim double"


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "block",
    n_blocks: int = 16,
    n_planes: int = 8,
    n_tables: int = 3,
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs: (id_a, id_b, sim) with
    id_a < id_b and cosine ≥ threshold.

    Three physical strategies for one logical operator:

    - ``"block"`` (default) — EXACT and fully distributed: vectors hash
      into ``n_blocks`` blocks, every unordered block pair becomes one
      task that NumPy-matmuls its two bounded sub-matrices. No driver
      collect, no broadcast of the corpus; executor memory per task is
      two blocks. Work is inherently O(n²) (that is what exact all-pairs
      means) but spread over B(B+1)/2 tasks with O(n·B) shuffle — size
      ``n_blocks`` ≈ n·vec_bytes / 100 MB so a block fits comfortably.
    - ``"lsh"`` — APPROXIMATE web-scale path: candidates from an OR of
      ``n_tables`` hyperplane-signature tables (one shuffle each),
      exact cosine verify ≥ threshold. Recall tunable via
      ``n_planes``/``n_tables``; precision is exact (verify step).
    - ``"broadcast"`` — the small-corpus path (≤ ~10⁵ vectors): the
      whole (id, normalized-vector) matrix broadcast to every executor,
      one matmul per Arrow batch. Opt-in only, since the driver builds
      the matrix.

    All strategies round sims to 6 dp after float64 matmul, so block
    and broadcast agree bit-for-bit with the sequential-fold DuckDB
    oracle (64-element double dots carry ~1e-14 error).
    """
    # NULL embeddings (dirty rows) can't be near anything, and a None
    # reaching the NumPy kernels kills the whole stage — drop them at
    # the operator boundary, before any strategy-specific plumbing.
    df = df.filter(F.col(vec_col).isNotNull())
    if method == "block":
        return _near_dup_pairs_block(df, threshold, id_col, vec_col, n_blocks)
    if method == "lsh":
        return _near_dup_pairs_lsh(df, threshold, id_col, vec_col, n_planes, n_tables, dim)
    if method == "broadcast":
        return _near_dup_pairs_broadcast(df, threshold, id_col, vec_col)
    raise ValueError(f"unknown method: {method!r} (block | lsh | broadcast)")


def _np_pack(items):
    """(id, vec) struct list → (ids int64 array, float64 matrix)."""
    import numpy as np

    ids = np.fromiter((it["id"] for it in items), dtype=np.int64, count=len(items))
    mat = np.stack([np.asarray(it["v"], dtype=np.float64) for it in items])
    norm = np.linalg.norm(mat, axis=1, keepdims=True)
    norm[norm == 0.0] = 1.0  # zero vectors stay zero (sim 0), never NaN
    return ids, mat / norm


def _near_dup_pairs_block(df, threshold, id_col, vec_col, n_blocks):
    import numpy as np

    src = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_blocks)).alias("b"),
    )
    # Each row fans out to every unordered block pair containing its
    # block — (min(b,o), max(b,o)) for o in 0..B-1, the diagonal (b,b)
    # emitted exactly once at o==b — BEFORE the single groupBy. One
    # corpus scan, one O(n·B) shuffle, one aggregation; the earlier
    # packed-self-join formulation scanned and packed the corpus twice
    # (no ReusedExchange across the renamed sides).
    pair_keys = F.transform(
        F.sequence(F.lit(0), F.lit(n_blocks - 1)),
        lambda o: F.struct(
            F.least(F.col("b"), o).alias("i"), F.greatest(F.col("b"), o).alias("j")
        ),
    )
    exploded = src.select("id", "v", "b", F.explode(pair_keys).alias("p")).select(
        "id", "v", "b", F.col("p.i").alias("i"), F.col("p.j").alias("j")
    )
    packed = exploded.groupBy("i", "j").agg(F.collect_list(F.struct("id", "v", "b")).alias("mem"))

    def score(batches):
        import pandas as pd

        for pdf in batches:
            for _, row in pdf.iterrows():
                same = row["i"] == row["j"]
                if same:
                    l_ids, l_mat = _np_pack(row["mem"])
                    r_ids, r_mat = l_ids, l_mat
                else:
                    left = [m for m in row["mem"] if m["b"] == row["i"]]
                    right = [m for m in row["mem"] if m["b"] == row["j"]]
                    if not left or not right:
                        continue
                    l_ids, l_mat = _np_pack(left)
                    r_ids, r_mat = _np_pack(right)
                sims = np.round(l_mat @ r_mat.T, 6)
                keep = sims >= threshold
                if same:
                    keep &= l_ids[:, None] < r_ids[None, :]  # each pair once, no self
                r, c = np.nonzero(keep)
                if not len(r):
                    continue
                ia, ib = l_ids[r], r_ids[c]
                yield pd.DataFrame(
                    {"id_a": np.minimum(ia, ib), "id_b": np.maximum(ia, ib), "sim": sims[r, c]}
                )

    return packed.mapInPandas(score, _PAIR_SCHEMA_DDL)


def _near_dup_pairs_lsh(df, threshold, id_col, vec_col, n_planes, n_tables, dim):
    if dim is None:
        # NB: inferring dim runs one driver-side job at plan-build time
        # (array length is not in the schema); pass dim explicitly to
        # keep construction lazy
        row = df.select(vec_col).first()
        if row is None or row[0] is None:
            return df.sparkSession.createDataFrame([], _PAIR_SCHEMA_DDL)
        dim = len(row[0])
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"))
    tables = [
        base.select(
            "id", "v", F.lit(t).alias("t"),
            hyperplane_signature(F.col("v"), dim, n_planes, seed=DEFAULT_SEED + t).alias("sig"),
        )
        for t in range(n_tables)
    ]
    sigs = tables[0]
    for t in tables[1:]:
        sigs = sigs.unionByName(t)
    a, b = sigs.alias("a"), sigs.alias("b")
    cand = (
        a.join(b, ["t", "sig"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.col("a.v").alias("va"), F.col("b.v").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])  # OR across tables
    )
    return (
        cand.select("id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def _near_dup_pairs_broadcast(df, threshold, id_col, vec_col):
    import numpy as np

    spark = df.sparkSession
    pdf = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).toPandas()
    ids = pdf["id"].to_numpy()
    mat = np.stack(pdf["v"].to_numpy()).astype(np.float64)
    norm = np.linalg.norm(mat, axis=1, keepdims=True)
    norm[norm == 0.0] = 1.0
    bc = spark.sparkContext.broadcast((ids, mat / norm))

    def score(batches):
        import pandas as pd

        all_ids, all_mat = bc.value
        for pdf_batch in batches:
            b_ids = pdf_batch["id"].to_numpy()
            b_mat = np.stack(pdf_batch["v"].to_numpy()).astype(np.float64)
            b_norm = np.linalg.norm(b_mat, axis=1, keepdims=True)
            b_norm[b_norm == 0.0] = 1.0
            sims = np.round((b_mat / b_norm) @ all_mat.T, 6)
            keep = (sims >= threshold) & (b_ids[:, None] < all_ids[None, :])
            r, c = np.nonzero(keep)
            yield pd.DataFrame({"id_a": b_ids[r], "id_b": all_ids[c], "sim": sims[r, c]})

    return df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).mapInPandas(score, _PAIR_SCHEMA_DDL)


def hyperplane_signature(vec: Column, dim: int, n_planes: int = 16, seed: int = DEFAULT_SEED) -> Column:
    """Random-hyperplane LSH signature (n_planes sign bits) as a bigint.

    Plane weights are deterministic ±1 per (plane, coordinate), derived
    from the engine hash — no driver-side randomness, identical on every
    executor. P[same bit] = 1 - θ/π, so equal signatures concentrate
    high-cosine pairs.

    Each plane is a ``zip_with`` dot product against a LITERAL weight
    array (constant-folded to one array literal) — not an unrolled
    512-term sum chain, whose ~4000-node expression tree costs seconds
    of driver-side analysis per query build. The sequential aggregate
    fold adds terms in the same left-assoc coordinate order as the
    unrolled chain, so sign tests (and the DuckDB oracle) agree
    bit-for-bit. Memoized per (input, params): Column trees are
    immutable and reusable, and this one costs ~1s of py4j calls.
    """
    from rustic_witcher_spark.operators.dedup import _memo_column

    return _memo_column(
        (str(vec), "hyperplane", dim, n_planes, seed),
        lambda: _hyperplane_signature_build(vec, dim, n_planes, seed),
    )


def _hyperplane_signature_build(vec: Column, dim: int, n_planes: int, seed: int) -> Column:
    bits = []
    for p in range(n_planes):
        # one py4j call for the whole weight vector — F.array(*lits)
        # would cost dim round-trips per plane at DataFrame-build time
        w = F.lit([float(plane_weight(seed, p, i)) for i in range(dim)])
        proj = F.aggregate(
            F.zip_with(vec, w, lambda x, y: x.cast("double") * y), F.lit(0.0), lambda acc, v: acc + v
        )
        bits.append(F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def random_projection(vec: Column, in_dim: int, out_dim: int, seed: int = DEFAULT_SEED) -> Column:
    """Deterministic sparse-sign random projection (Achlioptas-style):
    out_j = Σ_i w_ji·v_i / √out_dim with w ∈ {±1} derived from the
    engine hash — the cheap JL dimensionality reduction for 100 TB
    embedding columns (shrink 768-d to 64-d before LSH/storage).

    Pure expressions: one zip_with dot per output coordinate against a
    constant-folded literal weight array (same construction as
    ``hyperplane_signature``, which is this projection's sign bit).
    Deterministic per (seed, plane, coord) ⇒ identical on every
    executor and in the DuckDB oracle.
    """
    import math

    from rustic_witcher_spark.operators.dedup import _memo_column

    def build() -> Column:
        scale = 1.0 / math.sqrt(out_dim)
        outs = []
        for p in range(out_dim):
            w = F.lit([float(plane_weight(seed, p, i)) for i in range(in_dim)])
            proj = F.aggregate(
                F.zip_with(vec, w, lambda x, y: x.cast("double") * y), F.lit(0.0), lambda acc, v: acc + v
            )
            outs.append(F.round(proj * scale, 6))
        return F.array(*outs)

    return _memo_column((str(vec), "randproj", in_dim, out_dim, seed), build)


def sql_random_projection(vec_expr: str, in_dim: int, out_dim: int, seed: int = DEFAULT_SEED) -> str:
    """DuckDB twin: list_dot_product against the same literal weights."""
    import math

    scale = 1.0 / math.sqrt(out_dim)
    outs = []
    for p in range(out_dim):
        w = "[" + ", ".join(f"{float(plane_weight(seed, p, i))}" for i in range(in_dim)) + "]"
        outs.append(f"round(list_dot_product(({vec_expr})::DOUBLE[], {w}::DOUBLE[]) * {scale!r}, 6)")
    return "[" + ", ".join(outs) + "]"


def ivf_centroids(
    corpus: DataFrame,
    n_clusters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = DEFAULT_SEED,
    iters: int = 0,
) -> DataFrame:
    """Deterministic IVF centroids as (cid, cvec).

    Seeds are a hash-ordered pseudo-random sample of corpus vectors
    (md5 of the id — no driver randomness, stable across runs and
    cluster sizes), optionally refined by ``iters`` Lloyd steps, each a
    pure DataFrame pass: assign (k-way broadcast scoring) → mean vector
    per cluster via posexplode/groupBy/rebuild.

    NULL vectors are DROPPED structurally: a NULL row selected as a
    seed would poison a centroid, and the oracle skeletons' corpus CTE
    excludes them before seeding — the seed sample must see the same
    candidate set (r9 dirty-corpus fuzz).
    """
    corpus = corpus.filter(F.col(vec_col).isNotNull())
    seeds = (
        corpus.withColumn("__r", F.md5(F.concat(F.lit(f"{seed}|ivf|"), F.col(id_col).cast("string"))))
        .orderBy("__r", id_col)
        .limit(n_clusters)
    )
    # Unpartitioned window → Spark logs "No Partition Defined for Window"
    # in bench runs. Intentional and benign: it runs over exactly
    # n_clusters rows (16 by default) post-limit, never over the corpus.
    w = Window.orderBy("__r", id_col)
    cent = seeds.select(F.row_number().over(w).alias("cid"), F.col(vec_col).cast("array<double>").alias("cvec"))
    for _ in range(iters):
        assigned = ivf_assign(corpus, cent, id_col, vec_col)
        cent = (
            assigned.select("cid", F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "v"))
            .groupBy("cid", "pos")
            .agg(F.avg("v").alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]).alias("cvec")
            )
        )
    return cent


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """Attach the ``nprobe`` nearest centroid ids to every vector.

    Centroids are tiny → broadcast; scoring is a k-way fan-out of the
    corpus scan (the standard IVF build cost), then a per-vector top-n
    window. Ties break on cid for determinism.

    NULL vectors are DROPPED (the single choke point every IVF
    consumer — ivf_topk, semdedup, the persisted index writers — goes
    through): a NULL vector scores NaN against every centroid, and
    Spark's NaN-is-greatest ordering would assign it a real list and
    let it burn top-k slots downstream (r9 dirty-corpus fuzz).
    """
    corpus = corpus.filter(F.col(vec_col).isNotNull())
    scored = corpus.crossJoin(F.broadcast(centroids)).select(
        "*", cosine(F.col(vec_col), F.col("cvec")).alias("__csim")
    )
    w = Window.partitionBy(id_col).orderBy(F.col("__csim").desc(), F.col("cid").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= nprobe)
        .drop("cvec", "__csim", "__rn")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    nprobe: int = 2,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via IVF: corpus vectors live in their nearest
    centroid's inverted list; each query probes its ``nprobe`` nearest
    lists and re-ranks exactly inside them.

    At 100 TB: the corpus is assigned ONCE (ideally persisted
    partitioned by cid at ingest); a query batch touches only
    nprobe/n_clusters of the data — the cluster-pruning analogue of
    partition pruning. Recall is tunable via nprobe; exact duplicates
    are always recalled (identical vector → identical nearest list).
    """
    from rustic_witcher_spark.operators.materialize import materialize

    # centroids are n_clusters rows but their subtree is the whole Lloyd
    # step (cross-join + posexplode + two aggregates); consumed by BOTH
    # ivf_assign calls below, Catalyst re-derives it once per consumer
    # (two full duplicate subtrees in the r12 plan capture). Cut it once
    # — n_clusters rows, trivially checkpointable at any scale.
    cent = materialize(ivf_centroids(corpus, n_clusters, id_col, vec_col, iters=iters))
    inv = ivf_assign(corpus, cent, id_col, vec_col, nprobe=1).select(
        F.col("cid"), F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    probes = ivf_assign(queries, cent, id_col, vec_col, nprobe=nprobe).select(
        F.col("cid"), F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    scored = (
        inv.join(probes.hint("broadcast"), "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("sim"))
        # zero-norm vectors: cosine is 0/0 — NaN here, NULL in the
        # DuckDB twins; both mean "no similarity defined", so the row
        # drops before ranking (the block kernels' keep_q discipline)
        .filter(F.col("sim").isNotNull() & ~F.isnan(F.col("sim")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_write_index(
    corpus: DataFrame,
    path: str,
    n_clusters: int = 16,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF inverted lists as parquet PARTITIONED BY the
    centroid id, plus the centroids themselves under ``<path>/_centroids``.

    This is the production shape of IVF at 100 TB: the expensive part
    (centroid fit + corpus assignment) runs once at ingest; the
    partition layout turns every query's nprobe list selection into
    parquet PARTITION PRUNING — the scan literally never opens the
    other lists' files (asserted in tests via PartitionFilters).
    """
    from rustic_witcher_spark.operators.materialize import materialize

    # two consumers (the _centroids write and the corpus assignment) —
    # cut the Lloyd subtree once, same rationale as ivf_topk above
    cent = materialize(ivf_centroids(corpus, n_clusters, id_col, vec_col, iters=iters))
    cent.write.mode("overwrite").parquet(f"{path}/_centroids")
    inv = ivf_assign(corpus, cent, id_col, vec_col, nprobe=1)
    inv.write.mode("overwrite").partitionBy("cid").parquet(f"{path}/lists")


def ivf_query_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a persisted IVF index: probe-list selection compiles to a
    partition filter on ``cid``; only nprobe/n_clusters of the index is
    read. Exact re-rank inside the probed lists."""
    cent = spark.read.parquet(f"{path}/_centroids")
    probes = (
        ivf_assign(queries, cent, id_col, vec_col, nprobe=nprobe)
        .select(F.col("cid"), F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
        # materialize once: both the driver-side cid collect (for the
        # partition filter) and the join below reuse this result instead
        # of re-running the centroid scoring
        .localCheckpoint(eager=True)
    )
    probe_cids = [r["cid"] for r in probes.select("cid").distinct().collect()]
    inv = (
        spark.read.parquet(f"{path}/lists")
        .filter(F.col("cid").isin(probe_cids))  # -> PartitionFilters on cid
        .select("cid", F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    )
    scored = (
        inv.join(probes.hint("broadcast"), "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("sim"))
        # zero-norm vectors: cosine is 0/0 — NaN here, NULL in the
        # DuckDB twins; both mean "no similarity defined", so the row
        # drops before ranking (the block kernels' keep_q discipline)
        .filter(F.col("sim").isNotNull() & ~F.isnan(F.col("sim")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: bucket corpus and queries by hyperplane
    signature, exact cosine re-rank within buckets.

    At 100 TB: ONE shuffle on the signature (or none if the corpus is
    pre-bucketed by signature at ingest); bucket fan-out replaces the
    corpus-wide scan per query. Recall is tunable via n_planes (fewer
    planes → bigger buckets → higher recall, more compute).

    NULL vectors are DROPPED on both sides (the brute_force_topk
    convention): left in, a NULL vector signs every plane test false,
    lands in bucket 0 with real vectors, and emits NaN sims that rank
    first under Spark's NaN-is-greatest ordering.
    """
    corpus = corpus.filter(F.col(vec_col).isNotNull())
    queries = queries.filter(F.col(vec_col).isNotNull())
    sig = lambda df, idn, vn: df.select(  # noqa: E731
        F.col(id_col).alias(idn), F.col(vec_col).alias(vn), hyperplane_signature(F.col(vec_col), dim, n_planes).alias("__sig")
    )
    c = sig(corpus, "neighbor_id", "__cv")
    q = sig(queries, "query_id", "__qv")
    scored = (
        c.join(q.hint("broadcast"), "__sig")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("sim"))
        # zero-norm vectors: cosine is 0/0 — NaN here, NULL in the
        # DuckDB twins; both mean "no similarity defined", so the row
        # drops before ranking (the block kernels' keep_q discipline)
        .filter(F.col("sim").isNotNull() & ~F.isnan(F.col("sim")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hard_negative_top1_block(
    df: DataFrame,
    n_queries: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """numpy block-kernel twin of the Catalyst-HOF hard-negative entry
    (queries.q_hard_negatives): top-1 other-label cosine neighbor per
    query — the escape hatch for LARGE query sets, where per-pair HOF
    lambdas (interpreted multiply-adds) lose to a vectorized matmul by
    orders of magnitude.

    Plan shape: the query block (ids, labels, float64 matrix) ships to
    executors ONCE via sparkContext.broadcast (torrent, per-executor —
    never per-task closure capture, which would re-serialize a large
    query set with every task); mapInPandas emits ONE candidate row per
    (query, input batch) — the per-batch argmax under the other-label
    mask — and a map-side-combinable max(struct) reduces batches to the
    global top-1, so the shuffle carries |queries| rows per partition
    exactly like the HOF version. Same tie-break (sim DESC,
    neighbor_id ASC).

    Dirty-data policy (deliberate, same as cosine_near_dup_pairs):
    NULL-vector, NULL-label, zero-norm, and NaN-component rows are
    DROPPED at the kernel boundary — a degenerate vector has no
    direction, so it can neither query nor win. The HOF path instead
    propagates NULL sims (oracle-pinned) and raises on zero vectors
    under ANSI; on clean vectors the two paths are output-identical
    (pinned by test)."""
    import numpy as np

    qpdf = (
        df.filter(F.col(id_col) < n_queries)
        .filter(F.col(label_col).isNotNull() & F.col(vec_col).isNotNull())
        .select(id_col, vec_col, label_col)
        .toPandas()
    )
    out_ddl = (
        "query_id long, query_label int, neighbor_id long, neighbor_label int, sim double"
    )
    spark = df.sparkSession
    if qpdf.empty:
        return spark.createDataFrame([], out_ddl)
    q_ids = qpdf[id_col].to_numpy(dtype=np.int64)
    q_labels = qpdf[label_col].to_numpy(dtype=np.int64)
    q_mat = np.stack([np.asarray(v, dtype=np.float64) for v in qpdf[vec_col]])
    q_norm = np.linalg.norm(q_mat, axis=1)
    keep_q = np.isfinite(q_norm) & (q_norm > 0.0)
    q_ids, q_labels = q_ids[keep_q], q_labels[keep_q]
    if not len(q_ids):
        return spark.createDataFrame([], out_ddl)
    # broadcast RAW vectors + norms (not pre-normalized rows): the
    # cosine is computed dot/(|q|·|c|) — the same operation order as
    # the HOF twin and the SQL oracle, so float ulps can't diverge
    # across the three faces and flip a 6-dp rounding boundary
    b_q = spark.sparkContext.broadcast((q_ids, q_labels, q_mat[keep_q], q_norm[keep_q]))

    def score(batches):
        import pandas as pd

        q_ids, q_labels, q_mat, q_norm = b_q.value
        for pdf in batches:
            pdf = pdf[pdf[label_col].notna() & pdf[vec_col].notna()]
            if pdf.empty:
                continue
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_labels = pdf[label_col].to_numpy(dtype=np.int64)
            c_mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            c_norm = np.linalg.norm(c_mat, axis=1)
            keep = np.isfinite(c_norm) & (c_norm > 0.0)
            if not keep.any():
                continue
            c_ids, c_labels = c_ids[keep], c_labels[keep]
            sims = _round_half_away((q_mat @ c_mat[keep].T) / (q_norm[:, None] * c_norm[keep][None, :]))
            mask = q_labels[:, None] != c_labels[None, :]
            # NaN sims (poisoned components that survived the norm
            # screen) are masked per-candidate, never allowed to hide a
            # whole batch from a query
            sims = np.where(mask & np.isfinite(sims), sims, -np.inf)
            best_rows = []
            for qi in range(len(q_ids)):
                row = sims[qi]
                m = row.max()
                if not np.isfinite(m):
                    continue
                cand = np.nonzero(row == m)[0]
                ci = cand[np.argmin(c_ids[cand])]
                best_rows.append((q_ids[qi], q_labels[qi], c_ids[ci], c_labels[ci], m))
            if best_rows:
                yield pd.DataFrame(
                    best_rows,
                    columns=["query_id", "query_label", "neighbor_id", "neighbor_label", "sim"],
                )

    per_batch = df.select(id_col, vec_col, label_col).mapInPandas(score, out_ddl)
    best = per_batch.groupBy("query_id", "query_label").agg(
        F.max(
            F.struct(
                F.col("sim").alias("sim"),
                (-F.col("neighbor_id")).alias("__nn"),
                F.col("neighbor_id").alias("neighbor_id"),
                F.col("neighbor_label").alias("neighbor_label"),
            )
        ).alias("b")
    )
    return best.select(
        "query_id",
        "query_label",
        F.col("b.neighbor_id").alias("neighbor_id"),
        F.col("b.neighbor_label").alias("neighbor_label"),
        F.col("b.sim").alias("sim"),
    ).orderBy("query_id")


def brute_force_topk_block(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """numpy block-kernel twin of :func:`brute_force_topk` — same
    output contract on clean vectors (query_id, neighbor_id, sim,
    rank; self-matches excluded; ties by neighbor id), vectorized for
    large query sets. Query block broadcast once per executor (torrent,
    not per-task closure). Dirty-data policy as
    hard_negative_top1_block: NULL/zero-norm/NaN vectors are dropped
    at the kernel boundary (the HOF twin instead propagates NULL sims
    ranked last — oracle-pinned — and raises on zero vectors under
    ANSI).

    mapInPandas emits the per-batch top-k per query (k·|queries| rows
    per batch — bounded, never the scored cross product), then one
    window over the k-per-batch candidates picks the global top-k.
    The window input is |queries|·k·|batches| rows — orders of
    magnitude under the |queries|·|corpus| scored set the HOF version
    ranks."""
    import numpy as np

    spark = corpus.sparkSession
    qpdf = queries.filter(F.col(vec_col).isNotNull()).select(id_col, vec_col).toPandas()
    out_ddl = "query_id long, neighbor_id long, sim double"
    if qpdf.empty:
        return spark.createDataFrame([], out_ddl + ", rank int")
    q_ids = qpdf[id_col].to_numpy(dtype=np.int64)
    q_mat = np.stack([np.asarray(v, dtype=np.float64) for v in qpdf[vec_col]])
    q_norm = np.linalg.norm(q_mat, axis=1)
    keep_q = np.isfinite(q_norm) & (q_norm > 0.0)
    q_ids = q_ids[keep_q]
    if not len(q_ids):
        return spark.createDataFrame([], out_ddl + ", rank int")
    # raw vectors + norms, dot/(|q|·|c|) with half-away rounding — same
    # operation order as the HOF twin and the oracle (see
    # hard_negative_top1_block)
    b_q = spark.sparkContext.broadcast((q_ids, q_mat[keep_q], q_norm[keep_q]))

    def score(batches):
        import pandas as pd

        q_ids, q_mat, q_norm = b_q.value
        for pdf in batches:
            pdf = pdf[pdf[vec_col].notna()]
            if pdf.empty:
                continue
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            c_norm = np.linalg.norm(c_mat, axis=1)
            keep = np.isfinite(c_norm) & (c_norm > 0.0)
            if not keep.any():
                continue
            c_ids = c_ids[keep]
            sims = _round_half_away((q_mat @ c_mat[keep].T) / (q_norm[:, None] * c_norm[keep][None, :]))
            sims = np.where((q_ids[:, None] != c_ids[None, :]) & np.isfinite(sims), sims, -np.inf)
            rows = []
            kk = min(k, sims.shape[1])
            for qi in range(len(q_ids)):
                row = sims[qi]
                order = np.lexsort((c_ids, -row))[:kk]
                for ci in order:
                    if np.isfinite(row[ci]):
                        rows.append((q_ids[qi], c_ids[ci], row[ci]))
            if rows:
                yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "sim"])

    per_batch = corpus.select(id_col, vec_col).mapInPandas(score, out_ddl)
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return per_batch.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def exclusion_top1_block(
    corpus: DataFrame,
    anchors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    anchor_id_col: str = "anchor_id",
    anchor_vec_col: str = "__qv",
    excl_col: str = "__ex",
) -> DataFrame:
    """Top-1 cosine neighbor per anchor EXCLUDING a per-anchor id set
    (and the anchor itself) — the vectorized negative-mining leg for
    `contrastive_triplets`, where the exclusion is the anchor's
    near-dup partner set rather than a label mismatch.

    Same block-kernel shape as :func:`hard_negative_top1_block`: the
    anchor block (ids, float64 matrix, norms, exclusion id lists)
    broadcasts once per executor; each Arrow batch reduces to one
    candidate row per anchor via a matmul + masked argmax; a map-side
    max(struct) reduces batches to the global top-1 with the standard
    (sim DESC, neighbor_id ASC) tie-break. The anchor set is bounded by
    the corpus' near-dup rate — the same collect budget the entry
    documents; exclusion masking costs one np.isin per anchor per
    batch over its (small) partner list.

    Dirty-data policy as the sibling kernels: NULL-vector, zero-norm,
    and NaN rows drop at the kernel boundary on both the anchor and
    corpus inputs; the HOF fallback and the SQL oracle replicate the
    NULL/NaN drops via explicit sim filters (zero-norm remains the
    documented ANSI-division exposure all the cosine faces share, as
    for hard_negatives). Sims are
    computed dot/(|a|·|c|) and rounded half-away-from-zero to 6 dp
    INSIDE the kernel — identical operation order to the Catalyst HOF
    and the SQL oracle, so a 6-dp rounding boundary cannot flip across
    faces.
    """
    import numpy as np

    apdf = (
        anchors.filter(F.col(anchor_vec_col).isNotNull())
        .select(anchor_id_col, anchor_vec_col, excl_col)
        .toPandas()
    )
    out_ddl = "anchor_id long, neighbor_id long, sim double"
    spark = corpus.sparkSession
    if apdf.empty:
        return spark.createDataFrame([], out_ddl)
    a_ids = apdf[anchor_id_col].to_numpy(dtype=np.int64)
    a_mat = np.stack([np.asarray(v, dtype=np.float64) for v in apdf[anchor_vec_col]])
    a_norm = np.linalg.norm(a_mat, axis=1)
    keep_a = np.isfinite(a_norm) & (a_norm > 0.0)
    a_ids = a_ids[keep_a]
    if not len(a_ids):
        return spark.createDataFrame([], out_ddl)
    # exclusion = partners ∪ {self}: a degenerate near-dup of oneself
    # can never be the negative
    a_excl = [
        np.append(np.asarray(ex if ex is not None else [], dtype=np.int64), aid)
        for ex, aid in zip(apdf[excl_col][keep_a], a_ids)
    ]
    b_a = spark.sparkContext.broadcast((a_ids, a_mat[keep_a], a_norm[keep_a], a_excl))

    def score(batches):
        import pandas as pd

        a_ids, a_mat, a_norm, a_excl = b_a.value
        for pdf in batches:
            pdf = pdf[pdf[vec_col].notna()]
            if pdf.empty:
                continue
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            c_norm = np.linalg.norm(c_mat, axis=1)
            keep = np.isfinite(c_norm) & (c_norm > 0.0)
            if not keep.any():
                continue
            c_ids = c_ids[keep]
            sims = _round_half_away((a_mat @ c_mat[keep].T) / (a_norm[:, None] * c_norm[keep][None, :]))
            sims = np.where(np.isfinite(sims), sims, -np.inf)
            best_rows = []
            for ai in range(len(a_ids)):
                row = sims[ai].copy()
                row[np.isin(c_ids, a_excl[ai])] = -np.inf
                m = row.max()
                if not np.isfinite(m):
                    continue
                cand = np.nonzero(row == m)[0]
                ci = cand[np.argmin(c_ids[cand])]
                best_rows.append((a_ids[ai], c_ids[ci], m))
            if best_rows:
                yield pd.DataFrame(best_rows, columns=["anchor_id", "neighbor_id", "sim"])

    per_batch = corpus.select(id_col, vec_col).mapInPandas(score, out_ddl)
    best = per_batch.groupBy("anchor_id").agg(
        F.max(
            F.struct(
                F.col("sim").alias("sim"),
                (-F.col("neighbor_id")).alias("__nn"),
                F.col("neighbor_id").alias("neighbor_id"),
            )
        ).alias("b")
    )
    return best.select(
        "anchor_id",
        F.col("b.neighbor_id").alias("neighbor_id"),
        F.col("b.sim").alias("sim"),
    )
