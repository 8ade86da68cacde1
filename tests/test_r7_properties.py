"""Property-based correctness for the round-7 graph and skyline
operators: the distributed plans must agree with brute-force O(n²)/
O(n³) reference implementations on arbitrary small inputs — the same
strategy test_properties.py uses for packing/transforms."""

from __future__ import annotations

from itertools import combinations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

points = st.lists(
    st.tuples(st.integers(min_value=0, max_value=8), st.integers(min_value=0, max_value=8)),
    min_size=1,
    max_size=25,
)


def _brute_skyline(pts):
    out = []
    for i, (a1, a2) in enumerate(pts):
        dominated = any(
            (b1 >= a1 and b2 >= a2 and (b1 > a1 or b2 > a2))
            for j, (b1, b2) in enumerate(pts)
            if j != i
        )
        if not dominated:
            out.append((a1, a2))
    return sorted(out)


@given(pts=points)
@settings(**SETTINGS)
def test_skyline_matches_brute_force(spark, pts):
    from rustic_witcher_spark.operators.skyline import skyline_2d

    df = spark.createDataFrame([(i, a, b) for i, (a, b) in enumerate(pts)], "id int, m1 int, m2 int")
    got = sorted((r["m1"], r["m2"]) for r in skyline_2d(df, "m1", "m2").collect())
    assert got == _brute_skyline(pts)


edge_sets = st.sets(
    st.tuples(st.integers(min_value=0, max_value=7), st.integers(min_value=0, max_value=7)),
    min_size=0,
    max_size=20,
)


@given(raw=edge_sets)
@settings(**SETTINGS)
def test_triangle_count_matches_brute_force(spark, raw):
    from rustic_witcher_spark.operators import graph

    undirected = {(min(a, b), max(a, b)) for a, b in raw if a != b}
    if not undirected:
        return  # undirected_edges of an empty frame is schema-valid but trivial
    df = spark.createDataFrame([(a, b) for a, b in raw if a != b] or [(0, 1)], "a int, b int")
    df = df.filter("a != b")
    edges = graph.undirected_edges(df, "a", "b")
    row = graph.triangle_stats(edges).collect()[0]

    nodes = sorted({n for e in undirected for n in e})
    tri = sum(
        1
        for u, v, w in combinations(nodes, 3)
        if (u, v) in undirected and (v, w) in undirected and (u, w) in undirected
    )
    wedges = 0
    for n in nodes:
        d = sum(1 for e in undirected if n in e)
        wedges += d * (d - 1) // 2
    assert row["n_edges"] == len(undirected)
    assert row["n_triangles"] == tri
    if wedges:
        assert row["clustering_coeff"] == pytest.approx(round(3 * tri / wedges, 6))


intervals = st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=30)


@given(mins=intervals)
@settings(**SETTINGS)
def test_interval_coverage_matches_brute_union(spark, tmp_path_factory, mins):
    """Sweep-line union length == brute-force merged-interval length on
    arbitrary (duplicated, overlapping, touching) 30-min intervals."""
    from datetime import datetime, timedelta

    from rustic_witcher_spark.queries import q_interval_coverage

    t0 = datetime(2024, 1, 1)
    rows = [
        (i, t0 + timedelta(minutes=m), 1, "click", 1.0, "{}")
        for i, m in enumerate(mins)
    ]
    d = tmp_path_factory.mktemp("cov")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(str(d / "events.parquet"))
    out = q_interval_coverage(spark, str(d)).collect()[0]

    ivs = sorted((m, m + 30) for m in mins)
    merged, cur = [], list(ivs[0])
    for s, e in ivs[1:]:
        if s <= cur[1]:
            cur[1] = max(cur[1], e)
        else:
            merged.append(tuple(cur))
            cur = [s, e]
    merged.append(tuple(cur))
    total_min = sum(e - s for s, e in merged)
    assert out["covered_us"] == total_min * 60 * 1_000_000
    assert out["n_intervals"] == len(mins)


series = st.lists(st.floats(min_value=0.0, max_value=100.0, allow_nan=False), min_size=1, max_size=30)


@given(vals=series)
@settings(**SETTINGS)
def test_ewma_matches_python_recompute(spark, tmp_path_factory, vals):
    """The 12-lag truncated-kernel EWMA must equal a direct Python
    recompute with the same literal weights and renormalization."""
    from datetime import datetime, timedelta

    from rustic_witcher_spark.queries import _EWMA_W, q_ewma_events

    t0 = datetime(2024, 1, 1)
    rows = [
        (i, t0 + timedelta(hours=i), 1, "click", v, "{}")
        for i, v in enumerate(vals)
    ]
    d = tmp_path_factory.mktemp("ewma")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(str(d / "events.parquet"))
    out = {r["hour"]: r["ewma"] for r in q_ewma_events(spark, str(d)).collect()}

    hv = [round(v, 6) for v in vals]  # hour_value = round(sum per hour, 6)
    for t in range(len(hv)):
        num = sum(w * hv[t - k] for k, w in enumerate(_EWMA_W) if t - k >= 0)
        den = sum(w for k, w in enumerate(_EWMA_W) if t - k >= 0)
        key = (t0 + timedelta(hours=t)).strftime("%Y-%m-%d %H:%M:%S")
        assert out[key] == pytest.approx(round(num / den, 6), abs=2e-6)


# ---------------------------------------------------------------- shard digests

id_lists = st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=30, unique=True)
cut_fracs = st.floats(min_value=0.0, max_value=1.0)


@given(ids=id_lists, frac=cut_fracs)
@settings(**SETTINGS)
def test_stream_chunked_shard_manifest_equals_batch_manifest(spark, tmp_path_factory, ids, frac):
    """The manifest digest is an algebraic accumulator: splitting the
    SAME rows into two streamed micro-batches at ANY cut point must
    reproduce the batch-written manifest bit-for-bit (counts and
    per-shard digests), and both must verify."""
    from rustic_witcher_spark.sinks.shards import verify_training_shards, write_training_shards
    from rustic_witcher_spark.streaming.shard_stream import shard_append_batch

    d = tmp_path_factory.mktemp("digest_prop")
    rows = [(i, f"doc {i}") for i in ids]
    schema = "doc_id long, text string"
    batch_manifest = write_training_shards(
        spark.createDataFrame(rows, schema), "doc_id", 3, str(d / "batch")
    )
    cut = int(len(rows) * frac)
    streamed = str(d / "stream")
    shard_append_batch(spark.createDataFrame(rows[:cut] or [], schema), 0, "doc_id", 3, streamed)
    shard_append_batch(spark.createDataFrame(rows[cut:] or [], schema), 1, "doc_id", 3, streamed)
    import json as _json

    got = _json.loads((d / "stream" / "_shard_manifest.json").read_text())
    assert got["shards"] == {k: dict(v) for k, v in batch_manifest["shards"].items()}
    assert got["total_rows"] == batch_manifest["total_rows"]
    if rows[:cut] and rows[cut:]:
        assert verify_training_shards(spark, streamed) == []


# ---------------------------------------------------------------- KL drift

term_counts_st = st.dictionaries(
    st.sampled_from(["a", "b", "c", "d", "e"]),
    st.integers(min_value=1, max_value=50),
    min_size=1,
    max_size=5,
)


@given(stream=term_counts_st, ref=term_counts_st, scale=st.integers(min_value=1, max_value=9))
@settings(**SETTINGS)
def test_kl_nonnegative_and_zero_iff_proportional(spark, stream, ref, scale):
    """Gibbs' inequality survives the integer-nanonat rounding: KL of
    the matched distribution is ≥ -|terms| nanonats for ANY pair of
    count tables, and scaling the reference by a constant leaves
    KL(x ‖ x·k) at exactly 0."""
    from rustic_witcher_spark.streaming.drift import kl_vs_reference

    sdf = spark.createDataFrame(list(stream.items()), "term string, n long")
    rdf = spark.createDataFrame(list(ref.items()), "term string, n long")
    r = kl_vs_reference(sdf, rdf).collect()[0]
    matched_terms = len(set(stream) & set(ref))
    if matched_terms:
        assert r["kl_nanonats"] >= -matched_terms  # ≤0.5 nanonat rounding per term
    # proportional reference → exact zero (every per-term ratio is 1.0)
    prop = spark.createDataFrame([(t, n * scale) for t, n in stream.items()], "term string, n long")
    r0 = kl_vs_reference(sdf, prop).collect()[0]
    assert r0["kl_nanonats"] == 0 and r0["oov_tokens"] == 0


# ---------------------------------------------------------------- group split

source_lists = st.lists(st.text(alphabet="abcdef", min_size=1, max_size=6), min_size=1, max_size=12, unique=True)


@given(initial=source_lists, added=source_lists)
@settings(**SETTINGS)
def test_group_split_stable_under_corpus_growth(spark, initial, added):
    """SCALE.md's stability claim: adding new groups to the corpus
    never moves an existing group's split assignment — eval sets stay
    clean across incremental refreshes."""
    from pyspark.sql import functions as F

    from rustic_witcher_spark.operators.sampling import group_split

    def assign(sources):
        df = spark.createDataFrame([(s,) for s in sources], "source string")
        return {
            r["source"]: r["split"]
            for r in df.withColumn("split", group_split(F.col("source"))).collect()
        }

    before = assign(initial)
    after = assign(sorted(set(initial) | set(added)))
    for s, split in before.items():
        assert after[s] == split
