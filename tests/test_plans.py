"""Plan-shape regression tests: the properties that make the engine fast
at 100 TB must be visible in the physical plan, not just assumed.

These assert on executedPlan() text — if a future change silently turns
a broadcast join into a shuffle or un-pushes a filter, these fail.
"""

from __future__ import annotations

import pytest

from rustic_witcher_spark.queries import build_registry


@pytest.fixture(scope="module")
def registry():
    return build_registry()


def _plan(spark, registry, name, sf_dir):
    df = registry[name][0](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_anonymization_pipeline_has_no_shuffle(spark, registry, sf_dir):
    """Reference surface = scan → filter → project. Any Exchange here
    would be a scale bug (pipeline must run at scan speed)."""
    for q in ["anonymize_customer", "anonymize_supplier", "faker_suite", "sanitize_null_bytes"]:
        plan = _plan(spark, registry, q, sf_dir)
        assert "Exchange" not in plan, f"{q} plan shuffles:\n{plan[:2000]}"


def test_anonymization_filter_pushed_to_scan(spark, registry, sf_dir):
    plan = _plan(spark, registry, "anonymize_customer", sf_dir)
    assert "Not(In(c_nationkey" in plan  # F6 NOT-IN reaches the parquet reader


def test_star_join_broadcasts_dims(spark, registry, sf_dir):
    plan = _plan(spark, registry, "q5_nation_revenue", sf_dir)
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan


def test_q3_broadcasts_customer_dim(spark, registry, sf_dir):
    plan = _plan(spark, registry, "q3_top_revenue", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan  # dim filter pushed


def test_scan_prunes_columns(spark, registry, sf_dir):
    """Q1 reads 9 of 11 lineitem columns; the nullified acctbal column
    is pruned entirely from the anonymize_supplier scan."""
    plan = _plan(spark, registry, "anonymize_supplier", sf_dir)
    read = [line for line in plan.splitlines() if "ReadSchema" in line]
    assert read and "s_acctbal" not in read[0]  # replaced by literal NULL → pruned


def test_dedup_exact_is_single_shuffle(spark, registry, sf_dir):
    plan = _plan(spark, registry, "dedup_exact", sf_dir)
    # one exchange for the digest window; AQE may add a coalesce read but
    # no second shuffle of the data
    assert plan.count("Exchange hashpartitioning") == 1


def test_minhash_signature_is_shuffle_free_per_row(spark, registry, sf_dir):
    """Signature computation itself is a projection; the only exchange is
    the explicit repartition spread (RoundRobin), never a hash shuffle."""
    plan = _plan(spark, registry, "minhash_signatures", sf_dir)
    assert plan.count("Exchange hashpartitioning") == 0


def test_q13_outer_join_preserved(spark, registry, sf_dir):
    plan = _plan(spark, registry, "q13_order_distribution", sf_dir)
    assert "LeftOuter" in plan  # customers with zero orders must survive


def test_rollup_single_aggregate_pass(spark, registry, sf_dir):
    plan = _plan(spark, registry, "rollup_revenue", sf_dir)
    assert "Expand" in plan  # grouping sets expand...
    assert plan.count("Exchange hashpartitioning") == 1  # ...but one shuffle


def test_distinct_agg_two_phase(spark, registry, sf_dir):
    # exact count(DISTINCT) plans as the two-phase expansion, still
    # partial-aggregated map-side; both dims broadcast
    plan = _plan(spark, registry, "distinct_parts_per_supplier", sf_dir)
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
