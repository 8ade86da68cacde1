"""Semantic properties of the round-6 TPC-H join-pattern queries
(q20 nested-aggregate semi-join, q21 EXISTS/NOT-EXISTS stack) plus
the q12 determinism fix.

Oracle hash-equality is covered by the driver gate / compare_oracle;
these tests pin the MEANING: q20's majority-share condition against a
hand-computed share table, q21's sole-late-supplier condition against
a per-order replay, and the physical-plan requirement that neither
query ever degenerates into a cartesian/nested-loop join.
"""

from __future__ import annotations

from collections import defaultdict

import pyspark.sql.functions as F

from rustic_witcher_spark.queries import (
    _read,
    q2_min_cost_supplier,
    q11_important_parts,
    q12_shipping_lateness,
    q16_supplier_variety,
    q20_part_promotion,
    q21_waiting_suppliers,
)


def test_q12_output_is_ordered(spark, sf_dir):
    rows = q12_shipping_lateness(spark, sf_dir).collect()
    buckets = [r.ship_bucket for r in rows]
    assert buckets == sorted(buckets)  # the r05 hash failure was exactly this


def test_q20_matches_manual_majority_share(spark, sf_dir):
    li = (
        _read(spark, sf_dir, "lineitem")
        .join(_read(spark, sf_dir, "part").filter(F.col("p_type") == "MEDIUM").select("p_partkey"),
              F.col("l_partkey") == F.col("p_partkey"))
        .filter((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01"))
        .select("l_partkey", "l_suppkey", "l_quantity")
        .collect()
    )
    pair = defaultdict(int)
    tot = defaultdict(int)
    for r in li:
        q = int(r.l_quantity)
        pair[(r.l_partkey, r.l_suppkey)] += q
        tot[r.l_partkey] += q
    majors = {s for (p, s), q in pair.items() if q > 0.5 * tot[p]}
    got = q20_part_promotion(spark, sf_dir).collect()
    assert {r.s_suppkey for r in got} == majors
    names = [r.s_name for r in got]
    assert names == sorted(names)


def test_q21_matches_manual_sole_late_replay(spark, sf_dir):
    o = {r.o_orderkey: r.o_orderdate
         for r in _read(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").collect()}
    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate").collect()
    pairs, late = defaultdict(set), defaultdict(set)
    for r in li:
        od = o.get(r.l_orderkey)
        if od is None:
            continue
        pairs[r.l_orderkey].add(r.l_suppkey)
        if (r.l_shipdate - od).days > 90:
            late[r.l_orderkey].add(r.l_suppkey)
    s_rows = _read(spark, sf_dir, "supplier").collect()
    n3 = {r.n_nationkey for r in _read(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3").collect()}
    name_of = {r.s_suppkey: r.s_name for r in s_rows}
    in_nation = {r.s_suppkey for r in s_rows if r.s_nationkey in n3}
    numwait = defaultdict(int)
    for ok, late_sups in late.items():
        if len(late_sups) == 1 and len(pairs[ok]) > 1:
            (s,) = late_sups
            if s in in_nation:
                numwait[name_of[s]] += 1
    expected = sorted(numwait.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r.s_name, r.numwait) for r in q21_waiting_suppliers(spark, sf_dir).collect()]
    assert got == expected
    assert got, "sf0.001+ should produce at least one waiting supplier"


def test_q2_argmin_is_true_minimum(spark, sf_dir):
    li = (
        _read(spark, sf_dir, "lineitem")
        .join(_read(spark, sf_dir, "part").filter(F.col("p_size") <= 5).select("p_partkey"),
              F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_suppkey", (F.col("l_extendedprice") / F.col("l_quantity")).alias("up"))
        .collect()
    )
    best = {}
    for r in li:
        cur = best.get(r.l_partkey)
        if cur is None or (r.up, r.l_suppkey) < cur:
            best[r.l_partkey] = (r.up, r.l_suppkey)
    import math

    got = {r.p_partkey: (r.s_suppkey, r.min_unit_price) for r in q2_min_cost_supplier(spark, sf_dir).collect()}
    assert set(got) == set(best)
    for pk, (up, sk) in best.items():
        # same explicit floor-rounding as the query (engine-invariant)
        assert got[pk] == (sk, math.floor(up * 10000 + 0.5) / 10000.0), pk


def test_q11_threshold_is_strictly_applied(spark, sf_dir):
    per_part = {
        r.l_partkey: r.part_qty
        for r in _read(spark, sf_dir, "lineitem")
        .groupBy("l_partkey").agg(F.sum(F.col("l_quantity").cast("bigint")).alias("part_qty"))
        .collect()
    }
    thr = 1.5 * sum(per_part.values()) / len(per_part)
    expected = {k for k, v in per_part.items() if v > thr}
    got = [r.l_partkey for r in q11_important_parts(spark, sf_dir).collect()]
    assert set(got) == expected and expected  # selective AND non-empty
    qtys = [per_part[k] for k in got]
    assert qtys == sorted(qtys, reverse=True)


def test_q16_excluded_suppliers_never_counted(spark, sf_dir):
    excl = {r.s_suppkey for r in _read(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 1000).collect()}
    li = (
        _read(spark, sf_dir, "lineitem")
        .join(_read(spark, sf_dir, "part")
              .filter((F.col("p_brand") != "Brand#45") & (F.col("p_type") != "PROMO"))
              .select("p_partkey", "p_brand", "p_size"),
              F.col("l_partkey") == F.col("p_partkey"))
        .select("p_brand", "p_size", "l_suppkey")
        .collect()
    )
    expected = defaultdict(set)
    for r in li:
        if r.l_suppkey not in excl:
            expected[(r.p_brand, r.p_size)].add(r.l_suppkey)
    got = {(r.p_brand, r.p_size): r.supplier_cnt for r in q16_supplier_variety(spark, sf_dir).collect()}
    assert got == {k: len(v) for k, v in expected.items()}


def test_r6_plans_have_no_cartesian(spark, sf_dir):
    for fn in (q20_part_promotion, q21_waiting_suppliers, q2_min_cost_supplier,
               q16_supplier_variety):
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, fn.__name__
