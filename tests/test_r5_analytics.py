"""Semantic properties of the round-5 TPC-H join-pattern queries.

Oracle hash-equality is covered by the driver gate / compare_oracle;
these tests pin the SEMANTICS (anti-join exclusion, scalar-max
selection, correlated-threshold filtering, bucket completeness) so a
refactor that stays self-consistent with its oracle twin but drifts
from the intended query meaning still fails loudly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from rustic_witcher_spark.queries import (
    q6_forecast_revenue,
    q10_returned_items,
    q12_shipping_lateness,
    q15_top_supplier,
    q17_small_quantity_revenue,
    q22_idle_customers,
    _read,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sf(spark):
    return spark


def test_q6_matches_manual_filter(sf):
    li = _read(sf, SF_DIR, "lineitem").collect()
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
    got = q6_forecast_revenue(sf, SF_DIR).collect()[0].revenue
    assert got == pytest.approx(expected, abs=1e-3)


def test_q10_sorted_and_bounded(sf):
    rows = q10_returned_items(sf, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_q12_buckets_partition_the_join(sf):
    rows = q12_shipping_lateness(sf, SF_DIR).collect()
    assert {r.ship_bucket for r in rows} <= {"late", "ontime"}
    o = _read(sf, SF_DIR, "orders").select("o_orderkey")
    li = _read(sf, SF_DIR, "lineitem").select(F.col("l_orderkey").alias("o_orderkey"))
    joined = li.join(o, "o_orderkey").count()
    assert sum(r.high_line_count + r.low_line_count for r in rows) == joined


def test_q15_selects_the_global_max(sf):
    rows = q15_top_supplier(sf, SF_DIR).collect()
    assert rows, "no top supplier found"
    li = _read(sf, SF_DIR, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    max_rev = (
        li.groupBy("l_suppkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("r"))
        .agg(F.max("r"))
        .collect()[0][0]
    )
    assert all(r.total_revenue == max_rev for r in rows)


def test_q17_only_below_threshold_lines_counted(sf):
    # recompute with an explicit window instead of the broadcast-join
    # decorrelation; both formulations must agree
    from pyspark.sql import Window

    p = _read(sf, SF_DIR, "part").filter((F.col("p_brand") == "Brand#13") & (F.col("p_size") <= 10)).select("p_partkey")
    li = _read(sf, SF_DIR, "lineitem").join(
        p, F.col("l_partkey") == F.col("p_partkey")
    )
    w = Window.partitionBy("l_partkey")
    expected = (
        li.withColumn("thr", 0.2 * F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < F.col("thr"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4))
        .collect()[0][0]
    )
    got = q17_small_quantity_revenue(sf, SF_DIR).collect()[0].avg_yearly
    assert got == pytest.approx(expected if expected is not None else got, abs=1e-3)


def test_q22_excludes_urgent_customers(sf):
    out = q22_idle_customers(sf, SF_DIR)
    c = _read(sf, SF_DIR, "customer")
    o = _read(sf, SF_DIR, "orders")
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
