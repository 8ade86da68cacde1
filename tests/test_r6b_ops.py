"""Round-6 warehouse-ops operators: SCD2 history/snapshots, column
profiling, referential-integrity audit, gap-fill, log histograms,
Z-order layout, sliding-gram span dedup.

Same contract as test_r4_ops/test_r5_ops: (a) semantic check vs an
independent reference, (b) determinism / partition invariance,
(c) plan or structural properties the 100 TB story depends on.
(Oracle equality for the registry entries runs in
scripts/compare_oracle.py and the driver gate; these tests pin the
operator semantics on adversarial synthetic inputs.)
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from rustic_witcher_spark.operators import layout, profile, scd2
from rustic_witcher_spark.queries import (
    q_dup_span_fraction,
    q_events_gapfill,
    q_latency_histogram,
    q_zorder_layout,
)

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------------------------------- SCD2


def _changelog(spark):
    T = dt.datetime
    rows = [
        # key 1: a -> a -> b -> a   (middle duplicate collapses)
        (1, "a", T(2024, 1, 1, 0), 10),
        (1, "a", T(2024, 1, 1, 1), 11),
        (1, "b", T(2024, 1, 1, 2), 12),
        (1, "a", T(2024, 1, 1, 3), 13),
        # key 2: single version, open-ended
        (2, "x", T(2024, 1, 2, 0), 20),
        # key 3: same-timestamp tie broken by event_id
        (3, "p", T(2024, 1, 3, 0), 31),
        (3, "q", T(2024, 1, 3, 0), 32),
    ]
    return spark.createDataFrame(rows, "k long, state string, ts timestamp, eid long")


def test_scd2_collapses_runs_and_intervalizes(spark):
    hist = scd2.scd2_intervals(_changelog(spark), ["k"], ["state"], "ts", ["eid"])
    collected = hist.collect()
    assert len(collected) == 6  # 4 events for k=1 collapse to 3 runs, +1, +2
    # key by (k, valid_from, state): k=3's two versions share a timestamp
    rows = {(r["k"], str(r["valid_from"]), r["state"]): r for r in collected}
    r1 = rows[(1, "2024-01-01 00:00:00", "a")]
    assert r1["state"] == "a" and r1["n_changes"] == 2  # two events collapsed
    assert str(r1["valid_to"]) == "2024-01-01 02:00:00" and not r1["is_current"]
    r1b = rows[(1, "2024-01-01 02:00:00", "b")]
    assert str(r1b["valid_to"]) == "2024-01-01 03:00:00"
    r1c = rows[(1, "2024-01-01 03:00:00", "a")]
    assert r1c["state"] == "a" and r1c["valid_to"] is None and r1c["is_current"]


def test_scd2_intervals_are_contiguous_and_disjoint(spark):
    hist = scd2.scd2_intervals(_changelog(spark), ["k"], ["state"], "ts", ["eid"]).collect()
    by_key: dict[int, list] = {}
    for r in hist:
        by_key.setdefault(r["k"], []).append(r)
    for rs in by_key.values():
        rs.sort(key=lambda r: r["valid_from"])
        for a, b in zip(rs, rs[1:]):
            assert a["valid_to"] == b["valid_from"]  # no gaps, no overlaps
        assert rs[-1]["valid_to"] is None  # exactly one open version
        assert sum(r["is_current"] for r in rs) == 1


def test_scd2_same_ts_tiebreak_is_deterministic(spark):
    hist = scd2.scd2_intervals(_changelog(spark), ["k"], ["state"], "ts", ["eid"])
    k3 = sorted(
        [r for r in hist.collect() if r["k"] == 3], key=lambda r: (r["valid_from"], r["state"])
    )
    # eid order: p (31) before q (32); both at the same ts -> p closed by q
    assert [r["state"] for r in k3] == ["p", "q"]
    assert k3[0]["valid_to"] == k3[1]["valid_from"]
    assert k3[1]["is_current"]


def test_scd2_partition_invariance(spark):
    df = _changelog(spark)
    a = scd2.scd2_intervals(df, ["k"], ["state"], "ts", ["eid"]).collect()
    b = scd2.scd2_intervals(df.repartition(7), ["k"], ["state"], "ts", ["eid"]).collect()
    key = lambda r: (r["k"], str(r["valid_from"]), r["state"])
    assert sorted(map(key, a)) == sorted(map(key, b))


def test_scd2_snapshot_one_state_per_key(spark):
    hist = scd2.scd2_intervals(_changelog(spark), ["k"], ["state"], "ts", ["eid"])
    snap = scd2.scd2_snapshot(hist, "2024-01-01 02:30:00").collect()
    states = {r["k"]: r["state"] for r in snap}
    assert states == {1: "b"}  # k=2/k=3 don't exist yet at that ts
    late = scd2.scd2_snapshot(hist, "2025-06-01 00:00:00").collect()
    assert {r["k"]: r["state"] for r in late} == {1: "a", 2: "x", 3: "q"}
    assert all(r["is_current"] for r in late)


# --------------------------------------------------------- column profile


def test_column_profile_counts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")], "x long, s string"
    )
    rows = {r["column"]: r for r in profile.column_profile(df, ["x", "s"]).collect()}
    assert rows["x"]["n_rows"] == 4 and rows["x"]["n_nulls"] == 1
    assert rows["x"]["n_distinct"] == 2  # count(distinct) ignores NULL
    assert rows["x"]["min_value"] == "1" and rows["x"]["max_value"] == "2"
    assert rows["s"]["n_nulls"] == 1 and rows["s"]["n_distinct"] == 2
    assert rows["s"]["min_value"] == "a" and rows["s"]["max_value"] == "b"


def test_column_profile_no_expand_either_path(spark):
    df = spark.range(1000).withColumn("y", F.col("id") % 7)
    exact = profile.column_profile(df, ["id", "y"], exact=True)
    approx = profile.column_profile(df, ["id", "y"], exact=False)
    exact_plan = exact._jdf.queryExecution().executedPlan().toString()
    approx_plan = approx._jdf.queryExecution().executedPlan().toString()
    # exact NDVs run as per-column two-phase aggregates joined back by
    # broadcast — never the multi-distinct Expand rewrite (measured 6x
    # slower at sf0.1); approx stays one HLL++ aggregate
    assert "Expand" not in exact_plan
    assert "Expand" not in approx_plan
    assert exact_plan.count("BroadcastNestedLoopJoin") == 2  # 1-row joins only
    got = {r["column"]: r for r in approx.collect()}
    assert got["y"]["n_distinct"] == 7  # HLL++ exact at tiny cardinality
    assert abs(got["id"]["n_distinct"] - 1000) <= 50  # rsd 0.05
    exact_rows = {r["column"]: r for r in exact.collect()}
    assert exact_rows["id"]["n_distinct"] == 1000 and exact_rows["y"]["n_distinct"] == 7


# ------------------------------------------------------------- RI audit


def test_ri_orphans_detects_missing_parents(spark):
    child = spark.createDataFrame([(1,), (1,), (2,), (99,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    row = profile.ri_orphan_counts(child, "fk", parent, "pk", "c->p").collect()[0]
    assert (row["check_name"], row["n_child_rows"], row["n_orphans"]) == ("c->p", 4, 1)


def test_ri_orphans_counts_duplicate_orphan_rows(spark):
    # every orphan ROW counts, and duplicate parent keys don't multiply hits
    child = spark.createDataFrame([(9,), (9,), (1,)], "fk long")
    parent = spark.createDataFrame([(1,), (1,)], "pk long")
    row = profile.ri_orphan_counts(child, "fk", parent, "pk", "e", broadcast_parent=True).collect()[0]
    assert (row["n_child_rows"], row["n_orphans"]) == (3, 2)


def test_ri_testdata_is_consistent(spark):
    from rustic_witcher_spark.queries import q_ri_orphans

    rows = {r["check_name"]: r for r in q_ri_orphans(spark, SF_DIR).collect()}
    assert set(rows) == {
        "lineitem->orders", "lineitem->part", "lineitem->supplier", "orders->customer",
    }
    assert all(r["n_orphans"] == 0 for r in rows.values())
    assert rows["lineitem->orders"]["n_child_rows"] > 0


# ------------------------------------------------------------- gap fill


def test_gapfill_spine_is_complete_and_conserves_counts(spark):
    out = q_events_gapfill(spark, SF_DIR)
    rows = out.collect()
    types = {r["event_type"] for r in rows}
    hours = {r["hour_ts"] for r in rows}
    assert len(rows) == len(types) * len(hours)  # full cross spine
    from rustic_witcher_spark.sources.parquet import read_events

    total = read_events(spark, SF_DIR).count()
    assert sum(r["n_events"] for r in rows) == total  # gap fill adds zeros only
    assert any(r["n_events"] == 0 for r in rows)  # sf0.001 is sparse enough


# ------------------------------------------------------------ histogram


def test_latency_histogram_buckets_and_cdf(spark):
    rows = q_latency_histogram(spark, SF_DIR).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        assert r["lo"] == 2 ** r["bucket"] - 1  # value >= lo for the bucket
        by_type.setdefault(r["event_type"], []).append(r)
    for rs in by_type.values():
        rs.sort(key=lambda r: r["bucket"])
        shares = [r["share"] for r in rs]
        assert abs(sum(shares) - 1.0) < 1e-4
        cums = [r["cum_share"] for r in rs]
        assert cums == sorted(cums) and abs(cums[-1] - 1.0) < 1e-6


def test_histogram_bucket_boundaries_are_integer_exact(spark):
    df = spark.createDataFrame(
        [(0.0,), (0.99,), (1.0,), (2.99,), (3.0,), (6.99,), (7.0,), (15.0,)],
        "value double",
    ).withColumn("event_type", F.lit("t"))
    # bucket = floor(log2(floor(v)+1)) computed via binary-length: exact
    got = {
        r["value"]: (F, r)
        for r in df.select(
            "value",
            (F.length(F.conv((F.floor("value") + F.lit(1)).cast("long"), 10, 2)) - 1).alias("b"),
        ).collect()
    }
    expected = {0.0: 0, 0.99: 0, 1.0: 1, 2.99: 1, 3.0: 2, 6.99: 2, 7.0: 3, 15.0: 4}
    assert {v: r["b"] for v, (_, r) in got.items()} == expected


# -------------------------------------------------------------- z-order


def test_z_value_is_bijective_on_the_domain(spark):
    df = spark.range(256).select(
        (F.col("id") % 16).alias("x"), (F.col("id") / 16).cast("long").alias("y")
    )
    out = df.select("x", "y", layout.z_value(F.col("x"), F.col("y"), 4).alias("z")).collect()
    assert len({r["z"] for r in out}) == 256  # distinct (x,y) -> distinct z
    assert all(0 <= r["z"] < 256 for r in out)
    # python reference check on a few points
    def ref(x, y, bits=4):
        z = 0
        for i in range(bits):
            z += ((x >> i) & 1) << (2 * i)
            z += ((y >> i) & 1) << (2 * i + 1)
        return z

    for r in out[:32]:
        assert r["z"] == ref(r["x"], r["y"])


def test_zorder_buckets_bound_both_dimensions(spark):
    rows = q_zorder_layout(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # top byte of z pins the high 4 bits of x AND y: span <= 15 each
        assert r["x_max"] - r["x_min"] <= 15
        assert r["y_max"] - r["y_min"] <= 15


# ----------------------------------------------------------- span dedup


def test_dup_span_detects_unaligned_copies(spark, tmp_path):
    words = [f"w{i}" for i in range(40)]
    shared = " ".join(words[:20])  # 20-word run >= the 12-gram window
    docs = [
        (1, "intro words here " + shared),          # shared span at offset 3
        (2, shared + " completely different tail"),  # shared span at offset 0
        (3, "totally unrelated text " + " ".join(f"u{i}" for i in range(20))),
    ]
    import pandas as pd

    pd.DataFrame(docs, columns=["doc_id", "text"]).to_parquet(tmp_path / "documents.parquet")
    rows = {r["doc_id"]: r for r in q_dup_span_fraction(spark, str(tmp_path)).collect()}
    # docs 1 and 2 share every 12-gram inside the 20-word run (9 grams),
    # regardless of the differing offsets — the chunk-aligned signal
    # would have missed this
    assert rows[1]["n_dup_grams"] == 9 and rows[2]["n_dup_grams"] == 9
    assert rows[1]["dup_fraction"] > 0.5
    assert rows[3]["n_dup_grams"] == 0 and rows[3]["dup_fraction"] == 0.0


def test_dup_span_short_docs_survive_with_zero_grams(spark, tmp_path):
    import pandas as pd

    docs = [(1, "too short"), (2, " ".join(f"w{i}" for i in range(30)))]
    pd.DataFrame(docs, columns=["doc_id", "text"]).to_parquet(tmp_path / "documents.parquet")
    rows = {r["doc_id"]: r for r in q_dup_span_fraction(spark, str(tmp_path)).collect()}
    assert rows[1]["n_grams"] == 0 and rows[1]["dup_fraction"] == 0.0
    assert rows[2]["n_grams"] == 19 and rows[2]["n_dup_grams"] == 0


def test_events_anomaly_flags_respect_threshold(spark):
    from rustic_witcher_spark.queries import q_events_anomaly

    rows = q_events_anomaly(spark, SF_DIR).collect()
    assert rows  # sf0.001 is sparse: plenty of deviant hours
    assert all(abs(r["z_score"]) > 2.0 for r in rows)
    # zero-filled hours are visible to the detector (the outage class):
    # at sf0.001 some flagged hours have n_events == 0 for rare types
    flagged = q_events_anomaly(spark, SF_DIR)
    gap = q_events_gapfill(spark, SF_DIR)
    assert flagged.count() < gap.count()  # anomalies are a strict subset


# ----------------------------------------------------------- compaction


def test_compaction_plan_groups_near_target(spark):
    files = spark.createDataFrame(
        [(i, f"part-{i:05}.parquet", 40 + (i * 37) % 50) for i in range(200)],
        "fid long, path string, bytes long",
    )
    out = layout.compaction_plan(files, "path", "bytes", target_bytes=500, id_col="fid")
    rows = out.collect()
    assert len(rows) == 200  # every file assigned exactly once
    sizes: dict[int, int] = {}
    for r in rows:
        sizes[r["compaction_group"]] = sizes.get(r["compaction_group"], 0) + r["bytes"]
    groups = sorted(sizes)
    assert groups == list(range(len(groups)))  # dense group ids
    # all groups but the last land within target ± max file size
    for g in groups[:-1]:
        assert 500 - 90 <= sizes[g] <= 500 + 90
    total = sum(r["bytes"] for r in rows)
    assert sum(sizes.values()) == total


def test_compaction_plan_is_partitioning_invariant_with_hashed_ids(spark):
    files = spark.createDataFrame(
        [(f"f{i}", 100 + i % 7) for i in range(64)], "path string, bytes long"
    )
    a = layout.compaction_plan(files, "path", "bytes", 400).collect()
    b = layout.compaction_plan(files.repartition(9), "path", "bytes", 400).collect()
    ka = sorted((r["path"], r["compaction_group"]) for r in a)
    kb = sorted((r["path"], r["compaction_group"]) for r in b)
    assert ka == kb


# ------------------------------------------------- plan-shape enforcement


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_scd2_history_has_single_data_exchange(spark):
    from rustic_witcher_spark.queries import q_scd2_user_history

    plan = _plan(q_scd2_user_history(spark, SF_DIR))
    # one hash Exchange on user_id shared by both windows + the run
    # groupBy; the only other Exchange is the output orderBy's range
    # partitioning (a sink would drop it)
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Exchange rangepartitioning") == 1


def test_gapfill_joins_are_broadcast_only(spark):
    plan = _plan(q_events_gapfill(spark, SF_DIR))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 2  # types cross + counts join


def test_session_transitions_single_data_shuffle(spark):
    from rustic_witcher_spark.queries import q_session_transitions

    plan = _plan(q_session_transitions(spark, SF_DIR))
    # ONE data-sized shuffle (user_id for the lag window); the rollup
    # and share-window exchanges move only the <= |types|^2 matrix
    assert plan.count("hashpartitioning(user_id") == 1
    assert plan.count("Exchange hashpartitioning") == 3


def test_zorder_is_shuffle_free_before_the_rollup(spark):
    plan = _plan(q_zorder_layout(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1  # the bucket groupBy only


def test_events_anomaly_constant_series_yields_no_anomalies(spark, tmp_path):
    """Review regression: stddev 0 (constant per-type series) must be
    'no anomaly', not ANSI DIVIDE_BY_ZERO / NaN-flagging-everything."""
    import pandas as pd

    # one event per hour per type -> every per-type hourly count == 1
    rows = [
        (i * 2 + t, pd.Timestamp(2024, 1, 1, i), 1, typ, 1.0, "{}")
        for i in range(4)
        for t, typ in enumerate(["click", "view"])
    ]
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(tmp_path / "events.parquet")
    from rustic_witcher_spark.queries import q_events_anomaly

    assert q_events_anomaly(spark, str(tmp_path)).collect() == []


def test_zorder_write_produces_tight_file_stats(spark, tmp_path):
    """The actual data-skipping claim, proven on real files: writing
    the z-range-repartitioned frame gives every parquet file bounded
    min/max ranges on BOTH dimensions (pyarrow footer stats), so a
    predicate on either column prunes most files."""
    import pyarrow.parquet as pq
    from pathlib import Path

    # full 0..255 range on BOTH dims so neither span assertion is vacuous
    df = spark.range(65536).selectExpr("id % 256 AS x", "cast(id / 256 AS long) AS y")
    out = str(tmp_path / "zsorted")
    layout.zorder_layout(df, "x", "y", bits=8, num_files=16).write.mode("overwrite").parquet(out)
    files = list(Path(out).glob("*.parquet"))
    assert len(files) > 4  # range-repartitioned into multiple files
    spans = []
    for f in files:
        meta = pq.ParquetFile(f).metadata
        lo = {"x": None, "y": None}
        hi = {"x": None, "y": None}
        for rg in range(meta.num_row_groups):
            for ci in range(meta.num_columns):
                col = meta.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in lo and col.statistics is not None:
                    s = col.statistics
                    lo[name] = s.min if lo[name] is None else min(lo[name], s.min)
                    hi[name] = s.max if hi[name] is None else max(hi[name], s.max)
        spans.append((hi["x"] - lo["x"], hi["y"] - lo["y"]))
    # a random layout would give every file ~the full 0-255 span on
    # BOTH dims; 16 contiguous z-ranges pin the top 2 bits of each
    # coordinate, so spans stay well under the full range on both
    avg_x = sum(s[0] for s in spans) / len(spans)
    avg_y = sum(s[1] for s in spans) / len(spans)
    assert avg_x < 128 and avg_y < 128  # vs ~255 full span each


# ------------------------------------------------------- temporal join


def test_temporal_join_intersects_intervals(spark):
    T = dt.datetime
    a = spark.createDataFrame(
        [(1, "x", T(2024, 1, 1), T(2024, 1, 5), False, 1),
         (1, "y", T(2024, 1, 5), None, True, 1)],
        "k long, sa string, valid_from timestamp, valid_to timestamp, is_current boolean, n_changes long",
    )
    b = spark.createDataFrame(
        [(1, "p", T(2024, 1, 3), T(2024, 1, 7), False, 1),
         (1, "q", T(2024, 1, 7), None, True, 1)],
        "k long, sb string, valid_from timestamp, valid_to timestamp, is_current boolean, n_changes long",
    )
    rows = sorted(
        scd2.temporal_join(a, b, ["k"]).collect(), key=lambda r: r["valid_from"]
    )
    got = [
        (r["a_sa"], r["b_sb"], str(r["valid_from"])[:10],
         str(r["valid_to"])[:10] if r["valid_to"] else None)
        for r in rows
    ]
    assert got == [
        ("x", "p", "2024-01-03", "2024-01-05"),
        ("y", "p", "2024-01-05", "2024-01-07"),
        ("y", "q", "2024-01-07", None),  # both open ends -> NULL restored
    ]
    # adjacent-but-not-overlapping intervals excluded: a's [1,3) x b's
    # [3,7) did not appear; per-key output bounded by |A|+|B|
    assert len(rows) <= 4


def test_temporal_join_disjoint_keys_and_histories(spark):
    T = dt.datetime
    a = spark.createDataFrame(
        [(1, "x", T(2024, 1, 1), T(2024, 1, 2), False, 1)],
        "k long, sa string, valid_from timestamp, valid_to timestamp, is_current boolean, n_changes long",
    )
    b = spark.createDataFrame(
        [(2, "p", T(2024, 1, 1), None, True, 1),       # different key
         (1, "q", T(2024, 1, 2), None, True, 1)],      # touches, no overlap
        "k long, sb string, valid_from timestamp, valid_to timestamp, is_current boolean, n_changes long",
    )
    assert scd2.temporal_join(a, b, ["k"]).count() == 0


def test_temporal_join_plan_is_hash_join(spark):
    from rustic_witcher_spark.queries import q_state_tier_timeline

    plan = q_state_tier_timeline(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_temporal_join_commutes_with_snapshot(spark):
    """Algebraic law: snapshotting the temporal join at time t equals
    joining the two snapshots at t — for random histories and probe
    times, including interval boundaries (half-open semantics must
    agree on both paths)."""
    import random

    T = dt.datetime
    rng = random.Random(7)
    for trial in range(3):
        def mk(attr):
            rows, eid = [], 0
            for k in range(1, 4):
                t = 0
                for _ in range(rng.randint(1, 6)):
                    t += rng.randint(1, 4)
                    rows.append((k, f"{attr}{rng.randint(0, 2)}", T(2024, 1, 1, t), eid))
                    eid += 1
            return scd2.scd2_intervals(
                spark.createDataFrame(rows, "k long, s string, ts timestamp, eid long"),
                ["k"], ["s"], "ts", ["eid"],
            )

        a, b = mk("a"), mk("b")
        joined = scd2.temporal_join(a, b, ["k"])
        for t in [f"2024-01-01 {h:02d}:00:00" for h in (1, 3, 7, 12)] + [
            "2024-01-02 00:00:00"
        ]:
            via_join = {
                (r["k"], r["a_s"], r["b_s"])
                for r in scd2.scd2_snapshot(
                    joined.withColumn("is_current", F.lit(False)), t
                ).collect()
            }
            sa = {r["k"]: r["s"] for r in scd2.scd2_snapshot(a, t).collect()}
            sb = {r["k"]: r["s"] for r in scd2.scd2_snapshot(b, t).collect()}
            via_snap = {(k, sa[k], sb[k]) for k in set(sa) & set(sb)}
            assert via_join == via_snap, (trial, t)
