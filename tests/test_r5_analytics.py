"""Semantic properties of the round-5 TPC-H join-pattern queries.

Oracle hash-equality is covered by the driver gate / compare_oracle;
these tests pin the SEMANTICS (anti-join exclusion, scalar-max
selection, correlated-threshold filtering, bucket completeness,
conditional-ratio bounds, disjunctive-band membership) so a refactor
that stays self-consistent with its oracle twin but drifts from the
intended query meaning still fails loudly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from rustic_witcher_spark.queries import (
    q6_forecast_revenue,
    q8_market_share,
    q9_profit_by_nation,
    q10_returned_items,
    q12_shipping_lateness,
    q14_promo_revenue,
    q15_top_supplier,
    q17_small_quantity_revenue,
    q19_disjunctive_revenue,
    q22_idle_customers,
    _read,
)


def test_q6_matches_manual_filter(spark, sf_dir):
    li = _read(spark, sf_dir, "lineitem").collect()
    expected = round(
        sum(
            r.l_extendedprice * r.l_discount
            for r in li
            if "1996-01-01" <= r.l_shipdate.strftime("%Y-%m-%d") < "1997-01-01"
            and 0.02 <= r.l_discount <= 0.04
            and r.l_quantity < 24
        ),
        4,
    )
    got = q6_forecast_revenue(spark, sf_dir).collect()[0].revenue
    assert got == pytest.approx(expected, abs=1e-3)


def test_q10_sorted_and_bounded(spark, sf_dir):
    rows = q10_returned_items(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_q12_buckets_partition_the_join(spark, sf_dir):
    rows = q12_shipping_lateness(spark, sf_dir).collect()
    assert {r.ship_bucket for r in rows} <= {"late", "ontime"}
    o = _read(spark, sf_dir, "orders").select("o_orderkey")
    li = _read(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("o_orderkey"))
    joined = li.join(o, "o_orderkey").count()
    assert sum(r.high_line_count + r.low_line_count for r in rows) == joined


def test_q14_ratio_bounds_and_promo_only_numerator(spark, sf_dir):
    pct = q14_promo_revenue(spark, sf_dir).collect()[0].promo_revenue_pct
    assert 0.0 <= pct <= 100.0
    # recompute the ratio from the raw join — the query must equal it
    li = _read(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01")) & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    p = _read(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(p, li.l_partkey == p.p_partkey).select("p_type", "l_extendedprice", "l_discount").collect()
    num = sum(r.l_extendedprice * (1 - r.l_discount) for r in j if r.p_type == "PROMO")
    den = sum(r.l_extendedprice * (1 - r.l_discount) for r in j)
    assert den > 0, "test window selected no lineitems"
    assert pct == pytest.approx(round(100 * num / den, 4), abs=1e-3)


def test_q15_selects_the_global_max(spark, sf_dir):
    rows = q15_top_supplier(spark, sf_dir).collect()
    assert rows, "no top supplier found"
    li = _read(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    max_rev = (
        li.groupBy("l_suppkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("r"))
        .agg(F.max("r"))
        .collect()[0][0]
    )
    assert all(r.total_revenue == max_rev for r in rows)


def test_q17_agrees_with_window_formulation(spark, sf_dir):
    # recompute with an explicit window instead of the broadcast-join
    # decorrelation; both formulations must agree (and both must
    # actually produce a value — a None here means the fixture data
    # stopped exercising the query and the test needs a wider filter)
    from pyspark.sql import Window

    p = _read(spark, sf_dir, "part").filter((F.col("p_brand") == "Brand#13") & (F.col("p_size") <= 10)).select("p_partkey")
    li = _read(spark, sf_dir, "lineitem").join(
        p, F.col("l_partkey") == F.col("p_partkey")
    )
    w = Window.partitionBy("l_partkey")
    expected = (
        li.withColumn("thr", 0.2 * F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < F.col("thr"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4))
        .collect()[0][0]
    )
    got = q17_small_quantity_revenue(spark, sf_dir).collect()[0].avg_yearly
    assert expected is not None, "window recompute selected no rows — brand/size filter too narrow for fixture data"
    assert got is not None
    assert got == pytest.approx(expected, abs=1e-3)


def test_q19_only_band_members_counted(spark, sf_dir):
    got = q19_disjunctive_revenue(spark, sf_dir).collect()[0].revenue
    li = _read(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    p = _read(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(p, li.l_partkey == p.p_partkey).collect()

    def in_band(r):
        return (
            (r.p_brand == "Brand#1" and 1 <= r.p_size <= 10 and 1 <= r.l_quantity <= 15)
            or (r.p_brand == "Brand#7" and 1 <= r.p_size <= 20 and 10 <= r.l_quantity <= 25)
            or (r.p_brand == "Brand#20" and 1 <= r.p_size <= 30 and 25 <= r.l_quantity <= 40)
        )

    kept = [r for r in j if in_band(r)]
    assert kept, "no lineitems fall in any band — bands too narrow for fixture data"
    expected = round(sum(r.l_extendedprice * (1 - r.l_discount) for r in kept), 4)
    assert got == pytest.approx(expected, abs=1e-3)


def test_q8_share_is_a_fraction_of_unfiltered_volume(spark, sf_dir):
    rows = q8_market_share(spark, sf_dir).collect()
    assert rows, "no order years in the window"
    assert {r.o_year for r in rows} <= {1996, 1997}
    assert all(0.0 <= r.mkt_share <= 1.0 for r in rows)


def test_q9_rollup_is_complete(spark, sf_dir):
    rows = q9_profit_by_nation(spark, sf_dir).collect()
    assert rows
    nations = {r.n_name for r in _read(spark, sf_dir, "nation").collect()}
    assert {r.nation for r in rows} <= nations
    # grouped sum must equal the ungrouped total of the same join
    p = _read(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13").select("p_partkey")
    li = _read(spark, sf_dir, "lineitem")
    total = (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .collect()[0][0]
    )
    assert sum(r.profit for r in rows) == pytest.approx(total, rel=1e-6)


def test_q22_excludes_urgent_customers(spark, sf_dir):
    out = q22_idle_customers(spark, sf_dir)
    c = _read(spark, sf_dir, "customer")
    o = _read(spark, sf_dir, "orders")
    urgent_cust = {r.o_custkey for r in o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey").distinct().collect()}
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal")).collect()[0][0]
    eligible = [
        r for r in c.collect() if r.c_acctbal > avg_bal and r.c_custkey not in urgent_cust
    ]
    got = {(r.c_mktsegment): r.numcust for r in out.collect()}
    expected: dict[str, int] = {}
    for r in eligible:
        expected[r.c_mktsegment] = expected.get(r.c_mktsegment, 0) + 1
    assert got == expected
