"""Property-based correctness for the round-8 perceptual-hash media
dedup: the numpy kernel must agree with a slow pure-Python reference
on arbitrary byte strings (pinning the exact cell/comparison semantics
the DuckDB oracle replays), and the banded pair search must agree with
brute-force O(n²) enumeration on arbitrary fingerprint sets."""

from __future__ import annotations

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rustic_witcher_spark.operators.multimodal import perceptual_hash63

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

PURE_SETTINGS = dict(max_examples=200, deadline=None)


def _phash_reference(data: bytes, n_segments: int = 64) -> int:
    """Straight-from-the-docstring reference: cell of byte i is
    i*S//n; bit j set iff mean(cell j) > mean(cell j+1), integer
    cross-multiplied, missing cells contribute no comparisons."""
    n = len(data)
    if n == 0:
        return 0
    sums = [0] * n_segments
    cnts = [0] * n_segments
    for i, b in enumerate(data):
        s = i * n_segments // n
        sums[s] += b
        cnts[s] += 1
    out = 0
    for j in range(n_segments - 1):
        if cnts[j] and cnts[j + 1] and sums[j] * cnts[j + 1] > sums[j + 1] * cnts[j]:
            out |= 1 << j
    return out


@given(data=st.binary(min_size=0, max_size=400))
@settings(**PURE_SETTINGS)
def test_phash_kernel_matches_pure_python_reference(data):
    assert perceptual_hash63(data) == _phash_reference(data)


@given(data=st.binary(min_size=1, max_size=300), pos=st.integers(min_value=0, max_value=10**6), delta=st.integers(min_value=1, max_value=255))
@settings(**PURE_SETTINGS)
def test_phash_one_byte_edit_bounded_bit_damage(data, pos, delta):
    """A one-byte edit changes one cell's mean → can flip only the ≤2
    comparisons adjacent to that cell. This is the recall guarantee the
    planted-twin fixture relies on."""
    pos %= len(data)
    edited = bytearray(data)
    edited[pos] = (edited[pos] + delta) % 256
    if bytes(edited) == data:
        return
    d = bin(perceptual_hash63(data) ^ perceptual_hash63(bytes(edited))).count("1")
    assert d <= 2


hash_sets = st.lists(
    st.integers(min_value=0, max_value=(1 << 63) - 1), min_size=1, max_size=20, unique=True
)


@given(hs=hash_sets, max_h=st.integers(min_value=0, max_value=4))
@settings(**SETTINGS)
def test_hamming_banding_matches_brute_force(spark, hs, max_h):
    from rustic_witcher_spark.operators.dedup import hamming_near_duplicates

    df = spark.createDataFrame([(i, h) for i, h in enumerate(hs)], "doc_id long, ph long")
    got = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_near_duplicates(df, "doc_id", "ph", max_hamming=max_h).collect()
    )
    want = sorted(
        (i, j, bin(a ^ b).count("1"))
        for (i, a), (j, b) in combinations(enumerate(hs), 2)
        if bin(a ^ b).count("1") <= max_h
    )
    assert got == want


# ---------------------------------------------------------------------------
# exclusion_top1_block vs naive reference (contrastive negative leg)
# ---------------------------------------------------------------------------


@settings(**SETTINGS)
@given(data=st.data())
def test_exclusion_kernel_matches_naive_reference(spark, data):
    """The exclusion-aware block kernel must agree with a from-scratch
    O(anchors × corpus) Python reference on arbitrary vector sets and
    arbitrary exclusion lists — including exclusions covering the whole
    corpus (anchor drops out) and empty exclusion lists."""
    import math

    from rustic_witcher_spark.operators.similarity import (
        _round_half_away,
        exclusion_top1_block,
    )

    n = data.draw(st.integers(min_value=2, max_value=10))
    dim = data.draw(st.integers(min_value=2, max_value=4))
    vecs = [
        [data.draw(st.integers(min_value=-3, max_value=3)) * 0.5 + 0.25 for _ in range(dim)]
        for _ in range(n)
    ]
    # keep vectors non-degenerate: zero-norm rows are a documented
    # drop class tested separately
    vecs = [v if any(abs(x) > 1e-9 for x in v) else [1.0] + v[1:] for v in vecs]
    n_anchors = data.draw(st.integers(min_value=1, max_value=min(3, n)))
    excl = {
        a: sorted(set(data.draw(st.lists(st.integers(min_value=0, max_value=n - 1), max_size=n))))
        for a in range(n_anchors)
    }

    corpus = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    anchors = spark.createDataFrame(
        [(a, vecs[a], excl[a]) for a in range(n_anchors)],
        "anchor_id long, __qv array<double>, __ex array<long>",
    )
    got = {
        r["anchor_id"]: (r["neighbor_id"], r["sim"])
        for r in exclusion_top1_block(corpus, anchors).collect()
    }

    want = {}
    for a in range(n_anchors):
        banned = set(excl[a]) | {a}
        best = None
        qa = vecs[a]
        qn = math.sqrt(sum(x * x for x in qa))
        for c in range(n):
            if c in banned:
                continue
            cv = vecs[c]
            cn = math.sqrt(sum(x * x for x in cv))
            sim = float(_round_half_away(sum(x * y for x, y in zip(qa, cv)) / (qn * cn)))
            if best is None or sim > best[1] or (sim == best[1] and c < best[0]):
                best = (c, sim)
        if best is not None:
            want[a] = best
    assert got == want


# ---------------------------------------------------------------------------
# randomized clean-corpus oracle parity (r8-late entries)
# ---------------------------------------------------------------------------

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta", "dup", "spark"]


@settings(max_examples=3, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_r8_late_entries_oracle_parity_on_random_clean_corpora(spark, tmp_path_factory, data):
    """Beyond the fixed synthetic testdata: on RANDOM well-formed
    corpora (no NULL/NaN — the documented dirty policies are pinned
    separately), every r8-late entry must match its DuckDB twin
    exactly. This is the q12 class of bug-hunt: logic divergences that
    only appear on data shapes the fixed tables never produce."""
    import duckdb

    from rustic_witcher_spark import queries as Q

    rnd_docs = data.draw(st.integers(min_value=4, max_value=12))
    texts = [
        " ".join(data.draw(st.sampled_from(WORDS)) for _ in range(data.draw(st.integers(2, 12))))
        for _ in range(rnd_docs)
    ]
    # force at least one near-dup family so the triplet entry has work
    texts[1] = texts[0]
    # dim matches the testdata schema: the IVF-skeleton oracles
    # (embedding_outliers, knn_ivf, semdedup) generate SQL for a FIXED
    # dim — `avg(v[pos]) over range(1, dim+1)` yields NULL positions on
    # narrower vectors (a documented per-schema oracle contract, which
    # this fuzz's first run demonstrated by tripping on dim=4)
    dim = 64
    vecs = [
        [1.0] + [data.draw(st.integers(-4, 4)) * 0.5 for _ in range(7)] + [0.0] * (dim - 8)
        for _ in range(rnd_docs)
    ]
    d = tmp_path_factory.mktemp("fuzz")
    spark.createDataFrame(
        [(i, t, "en", f"src{i % 2}", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    spark.createDataFrame(
        [(i, v, i % 3) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>, label long",
    ).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet/*.parquet')")

    import __spark_entry__ as entrymod

    qs, osqls = entrymod.queries(), entrymod.oracle_sql()
    # the r8-late additions plus the doc/embedding entries rotating
    # into the r9 window with the OLDEST driver verdicts — random
    # corpora harden exactly the cohort the fixed tables covered least
    fuzzed = [
        "repetition_signals", "hybrid_search_rrf", "contrastive_triplets",
        "embedding_outliers", "text_stats", "doc_quality", "text_langid",
        "dedup_exact", "bm25_search", "knn_bruteforce",
        "minhash_signatures", "minhash_lsh_candidates", "simhash",
        "simhash_near_dups", "ngram_jaccard_adjacent", "dedup_clusters",
        "dedup_survivors", "dedup_weighted", "chunk_dedup",
        "dup_span_fraction", "decontaminate", "unigram_nll",
        "corpus_report", "text_fingerprint", "tfidf_top_terms",
        "vocab_top_terms", "term_pmi", "langid_confusion",
        "source_overlap", "doc_length_deciles", "source_cap",
        "leakage_safe_split", "source_kl_divergence", "dsir_selection",
        "bpe_merge_step", "bpe_merge_chain", "mixture_temperature",
        "quality_threshold_sweep", "pii_redact", "weighted_reservoir",
        "stratified_sample", "knn_lsh", "knn_ivf", "semdedup",
        "embedding_near_dups", "embedding_project", "embedding_dim_stats",
        "hard_negatives", "pq_ann_topk",
        "curation_pipeline", "dedup_incremental", "lsh_calibration",
        "mixture_sample", "pack_sequences", "token_budget_selection",
        "token_count_bpe", "training_shards", "weighted_sample",
        "drift_vs_reference", "ann_recall_eval", "media_metadata",
        "media_near_dups", "multimodal_features", "frame_sample",
        "feature_hash_embed",
        # r9 additions (corpus-shaped): the containment prefix filter,
        # novelty first-owner attribution, and the Heaps-curve decile
        # boundaries are exactly the kind of logic random corpora break
        "containment_near_dups", "novelty_scores", "vocab_growth",
    ]
    from concurrent.futures import ThreadPoolExecutor

    from conftest import sweep_entries

    # Spark side concurrently (guide §2.6); DuckDB oracles on ONE
    # dedicated thread overlapped with the Spark sweep (the connection
    # is used by exactly one thread at a time).
    with ThreadPoolExecutor(max_workers=1) as ora_pool:
        ora_fut = ora_pool.submit(
            lambda: {n: con.execute(osqls[n]).fetchdf() for n in fuzzed}
        )
        got = sweep_entries([(n, lambda n=n: qs[n](spark, str(d)).toPandas()) for n in fuzzed])
        oracles = ora_fut.result()
    for name in fuzzed:
        g, exc = got[name]
        if exc is not None:
            raise exc
        w = oracles[name]
        cols = sorted(g.columns)
        gs = sorted(map(tuple, g[cols].astype(str).values.tolist()))
        ws = sorted(map(tuple, w[cols].astype(str).values.tolist()))
        assert gs == ws, (name, len(gs), len(ws), gs[:3], ws[:3])


@settings(max_examples=3, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_event_entries_oracle_parity_on_random_clean_streams(spark, tmp_path_factory, data):
    """Random well-formed event streams (whole-microsecond NTZ
    timestamps, exact-cent values, the testdata type vocabulary) —
    window/funnel/sweep-line entries must match their DuckDB twins
    exactly. Hardens the event cohort rotating through the r9/r10
    windows against timestamp/rounding logic divergences the fixed
    stream never exercises (bursts, same-second ties, single-user
    streams)."""
    import datetime

    import duckdb

    import __spark_entry__ as entrymod

    n = data.draw(st.integers(min_value=5, max_value=40))
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(n):
        ts = base + datetime.timedelta(
            seconds=data.draw(st.integers(0, 3 * 3600)),
            microseconds=data.draw(st.sampled_from([0, 250000, 999999])),
        )
        rows.append((
            i,
            ts,
            data.draw(st.integers(1, 4)),  # few users -> dense per-user streams
            data.draw(st.sampled_from(["click", "view", "purchase", "signup", "error"])),
            data.draw(st.integers(0, 9999)) / 100.0,  # exact cents
            '{"k": %d}' % data.draw(st.integers(0, 99)),
        ))
    d = tmp_path_factory.mktemp("evfuzz")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.mode("overwrite").parquet(str(d / "events.parquet"))

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet/*.parquet')")

    qs, osqls = entrymod.queries(), entrymod.oracle_sql()
    fuzzed = [
        "events_tumbling", "events_sliding", "funnel_3step", "peak_concurrency",
        "interval_coverage", "events_mad_outliers", "user_dwell_stats",
        "funnel_click_purchase", "value_percentiles",
        "events_session", "cohort_retention", "events_gapfill",
        "events_anomaly", "latency_histogram", "quantile_sketch_events",
        "session_transitions", "rolling_distinct_users", "events_moving_avg",
        "asof_last_purchase", "hll_users", "heavy_hitters",
        "events_json_extract", "ewma_events", "sanitize_null_bytes",
        "cdc_upsert", "click_attribution", "events_in_campaign_windows",
        "events_rollup_cascade", "purchases_with_state_asof",
        "scd2_point_in_time", "scd2_user_history", "state_tier_timeline",
    ]
    from concurrent.futures import ThreadPoolExecutor

    from conftest import sweep_entries

    # Spark side concurrently (guide §2.6); DuckDB oracles on ONE
    # dedicated thread overlapped with the Spark sweep (the connection
    # is used by exactly one thread at a time).
    with ThreadPoolExecutor(max_workers=1) as ora_pool:
        ora_fut = ora_pool.submit(
            lambda: {n: con.execute(osqls[n]).fetchdf() for n in fuzzed}
        )
        got = sweep_entries([(n, lambda n=n: qs[n](spark, str(d)).toPandas()) for n in fuzzed])
        oracles = ora_fut.result()
    for name in fuzzed:
        g, exc = got[name]
        if exc is not None:
            raise exc
        w = oracles[name]
        cols = sorted(g.columns)
        gs = sorted(map(tuple, g[cols].astype(str).values.tolist()))
        ws = sorted(map(tuple, w[cols].astype(str).values.tolist()))
        assert gs == ws, (name, len(gs), len(ws), gs[:3], ws[:3])


@settings(max_examples=3, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_lineitem_entries_oracle_parity_on_random_clean_tables(spark, tmp_path_factory, data):
    """Random well-formed lineitem+orders tables (exact-cent doubles,
    whole-day NTZ dates, the testdata categorical domains) — the
    scan-agg/bucket/ratio TPC-H entries must match their DuckDB twins
    exactly. This is the literal q12 bug class (HUGEINT/dtype drift on
    aggregates) probed on shapes the fixed tables never produce:
    single-order tables, all-one-flag tables, zero-discount rows,
    duplicate orderkeys across priorities."""
    import datetime

    import duckdb

    import __spark_entry__ as entrymod

    n_orders = data.draw(st.integers(min_value=2, max_value=15))
    base = datetime.datetime(2024, 1, 1)
    orows = []
    for ok in range(n_orders):
        orows.append((
            ok,
            data.draw(st.integers(1, 5)),
            data.draw(st.sampled_from(["P", "O", "F"])),
            data.draw(st.integers(100, 99999)) / 100.0,
            base + datetime.timedelta(days=data.draw(st.integers(0, 300))),
            data.draw(st.sampled_from(
                ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])),
        ))
    n_items = data.draw(st.integers(min_value=3, max_value=40))
    lrows = []
    for i in range(n_items):
        lrows.append((
            data.draw(st.integers(0, n_orders - 1)),
            data.draw(st.integers(1, 20)),  # partkey
            data.draw(st.integers(1, 10)),  # suppkey
            i,
            float(data.draw(st.integers(1, 50))),
            data.draw(st.integers(100, 999999)) / 100.0,
            data.draw(st.sampled_from([0.0, 0.01, 0.05, 0.1])),
            data.draw(st.sampled_from([0.0, 0.02, 0.08])),
            data.draw(st.sampled_from(["R", "A", "N"])),
            data.draw(st.sampled_from(["O", "F"])),
            base + datetime.timedelta(days=data.draw(st.integers(0, 400))),
        ))
    d = tmp_path_factory.mktemp("lifuzz")
    spark.createDataFrame(
        orows,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
        "o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(d / "orders.parquet"))
    spark.createDataFrame(
        lrows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, l_quantity double, "
        "l_extendedprice double, l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    ).write.mode("overwrite").parquet(str(d / "lineitem.parquet"))

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet/*.parquet')")

    qs, osqls = entrymod.queries(), entrymod.oracle_sql()
    fuzzed = ["q1_pricing_summary", "q6_forecast_revenue", "q12_shipping_lateness", "q4_priority_returns"]
    from concurrent.futures import ThreadPoolExecutor

    from conftest import sweep_entries

    # Spark side concurrently (guide §2.6); DuckDB oracles on ONE
    # dedicated thread overlapped with the Spark sweep (the connection
    # is used by exactly one thread at a time).
    with ThreadPoolExecutor(max_workers=1) as ora_pool:
        ora_fut = ora_pool.submit(
            lambda: {n: con.execute(osqls[n]).fetchdf() for n in fuzzed}
        )
        got = sweep_entries([(n, lambda n=n: qs[n](spark, str(d)).toPandas()) for n in fuzzed])
        oracles = ora_fut.result()
    for name in fuzzed:
        g, exc = got[name]
        if exc is not None:
            raise exc
        w = oracles[name]
        cols = sorted(g.columns)
        gs = sorted(map(tuple, g[cols].astype(str).values.tolist()))
        ws = sorted(map(tuple, w[cols].astype(str).values.tolist()))
        assert gs == ws, (name, len(gs), len(ws), gs[:3], ws[:3])


@settings(max_examples=2, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_join_entries_oracle_parity_on_random_mini_warehouse(spark, tmp_path_factory, data):
    """Random consistent mini-warehouse (region→nation→customer/
    supplier FK web, parts, orders, lineitem) — the join-pattern
    entries must match their DuckDB twins exactly. Probes join/agg
    logic on shapes the fixed tables never produce: empty regions,
    single-customer nations, every-order-same-day, promo-only parts."""
    import datetime

    import duckdb

    import __spark_entry__ as entrymod

    base = datetime.datetime(2024, 1, 1)
    regions = [(i, n) for i, n in enumerate(["MIDDLE EAST", "AMERICA", "EUROPE", "ASIA", "AFRICA"])]
    n_nations = data.draw(st.integers(3, 8))
    nations = [(i, f"NATION{i}", data.draw(st.integers(0, 4))) for i in range(n_nations)]
    n_cust = data.draw(st.integers(2, 10))
    custs = [
        (i, f"Customer#{i}", data.draw(st.integers(0, n_nations - 1)),
         data.draw(st.integers(-5000, 999900)) / 100.0,
         data.draw(st.sampled_from(["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"])))
        for i in range(n_cust)
    ]
    n_supp = data.draw(st.integers(1, 6))
    supps = [
        (i, f"Supplier#{i}", data.draw(st.integers(0, n_nations - 1)),
         data.draw(st.integers(-5000, 999900)) / 100.0)
        for i in range(n_supp)
    ]
    n_part = data.draw(st.integers(1, 8))
    parts = [
        (i, f"part name {i}", f"Brand#{data.draw(st.integers(1, 20))}",
         data.draw(st.sampled_from(["ECONOMY", "STANDARD", "LARGE", "MEDIUM", "SMALL", "PROMO"])),
         data.draw(st.integers(1, 50)), data.draw(st.integers(100, 99999)) / 100.0)
        for i in range(n_part)
    ]
    n_orders = data.draw(st.integers(2, 12))
    orders = [
        (ok, data.draw(st.integers(0, n_cust - 1)), data.draw(st.sampled_from(["P", "O", "F"])),
         data.draw(st.integers(100, 99999)) / 100.0,
         base + datetime.timedelta(days=data.draw(st.integers(0, 300))),
         data.draw(st.sampled_from(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])))
        for ok in range(n_orders)
    ]
    n_items = data.draw(st.integers(3, 30))
    items = [
        (data.draw(st.integers(0, n_orders - 1)), data.draw(st.integers(0, n_part - 1)),
         data.draw(st.integers(0, n_supp - 1)), i, float(data.draw(st.integers(1, 50))),
         data.draw(st.integers(100, 999999)) / 100.0,
         data.draw(st.sampled_from([0.0, 0.01, 0.05, 0.1])),
         data.draw(st.sampled_from([0.0, 0.02, 0.08])),
         data.draw(st.sampled_from(["R", "A", "N"])), data.draw(st.sampled_from(["O", "F"])),
         base + datetime.timedelta(days=data.draw(st.integers(0, 400))))
        for i in range(n_items)
    ]
    d = tmp_path_factory.mktemp("whfuzz")
    spark.createDataFrame(regions, "r_regionkey int, r_name string").write.parquet(str(d / "region.parquet"))
    spark.createDataFrame(nations, "n_nationkey int, n_name string, n_regionkey int").write.parquet(str(d / "nation.parquet"))
    spark.createDataFrame(custs, "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string").write.parquet(str(d / "customer.parquet"))
    spark.createDataFrame(supps, "s_suppkey long, s_name string, s_nationkey int, s_acctbal double").write.parquet(str(d / "supplier.parquet"))
    spark.createDataFrame(parts, "p_partkey long, p_name string, p_brand string, p_type string, p_size int, p_retailprice double").write.parquet(str(d / "part.parquet"))
    spark.createDataFrame(orders, "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string").write.parquet(str(d / "orders.parquet"))
    spark.createDataFrame(items, "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, l_quantity double, l_extendedprice double, l_discount double, l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp").write.parquet(str(d / "lineitem.parquet"))
    # small doc/embedding tables so cross-table readers (fake_multi_email,
    # ops_healthcheck) resolve; content exercised by the corpus fuzz
    docs = [(i, f"alpha beta doc {i}", "en", f"src{i % 2}", 16) for i in range(4)]
    spark.createDataFrame(docs, "doc_id long, text string, lang string, source string, n_chars long").write.parquet(str(d / "documents.parquet"))
    spark.createDataFrame(
        [(i, [1.0] + [0.0] * 63, i % 2) for i in range(4)],
        "vec_id long, embedding array<double>, label long",
    ).write.parquet(str(d / "embeddings.parquet"))
    evts = [
        (i, base + datetime.timedelta(minutes=7 * i), i % 3 + 1,
         ["click", "view", "purchase"][i % 3], (i * 137 % 1000) / 100.0, '{"k": 1}')
        for i in range(6)
    ]
    spark.createDataFrame(
        evts, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(str(d / "events.parquet"))

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "documents", "embeddings", "events"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet/*.parquet')")

    qs, osqls = entrymod.queries(), entrymod.oracle_sql()
    fuzzed = [
        "q3_top_revenue", "q5_nation_revenue", "q10_returned_items",
        "q14_promo_revenue", "q13_order_distribution", "rollup_revenue",
        "q7_nation_volume", "q8_market_share", "q9_profit_by_nation",
        "q15_top_supplier", "q18_large_orders", "q22_idle_customers",
        "q2_min_cost_supplier", "q11_important_parts", "q16_supplier_variety",
        "q20_part_promotion", "q21_waiting_suppliers",
        "top_customers_per_nation", "distinct_parts_per_supplier",
        "q17_small_quantity_revenue", "q19_disjunctive_revenue",
        "fuzzy_part_names", "orders_pivot", "grouping_sets_revenue",
        "lineitem_unpivot", "customer_revenue_standing", "benford_profile",
        "pareto_suppliers", "triangle_count", "supplier_pagerank",
        "customer_churn_sets", "ri_orphans",
        "filter_contains", "filter_startswith", "filter_endswith",
        "filter_startsends", "filter_equals", "filter_anyofint",
        "filter_anyofstring", "anonymize_customer", "anonymize_supplier",
        "anonymize_orders", "faker_suite", "fake_multi_email",
        "fake_email_id_prefix", "keep_num_of_records", "agg_max_pk",
        "validation_check", "datadiff_check", "skew_salted_stats",
        "column_profile", "ops_healthcheck", "bloom_probe", "zorder_layout",
    ]
    from concurrent.futures import ThreadPoolExecutor

    from conftest import sweep_entries

    # Spark side concurrently (guide §2.6); DuckDB oracles on ONE
    # dedicated thread overlapped with the Spark sweep (the connection
    # is used by exactly one thread at a time).
    with ThreadPoolExecutor(max_workers=1) as ora_pool:
        ora_fut = ora_pool.submit(
            lambda: {n: con.execute(osqls[n]).fetchdf() for n in fuzzed}
        )
        got = sweep_entries([(n, lambda n=n: qs[n](spark, str(d)).toPandas()) for n in fuzzed])
        oracles = ora_fut.result()
    for name in fuzzed:
        g, exc = got[name]
        if exc is not None:
            raise exc
        w = oracles[name]
        cols = sorted(g.columns)
        gs = sorted(map(tuple, g[cols].astype(str).values.tolist()))
        ws = sorted(map(tuple, w[cols].astype(str).values.tolist()))
        assert gs == ws, (name, len(gs), len(ws), gs[:3], ws[:3])
