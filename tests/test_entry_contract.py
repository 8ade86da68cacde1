"""Driver-contract smoke: __spark_entry__ must ALWAYS import and expose
a complete registry. Round 3 shipped a NameError in build_registry() that
zeroed every driver verdict; this file makes that class of bug a loud,
cheap test failure instead of a silent round-killer.

No Spark session needed — these tests exercise import surface and oracle
SQL syntax only, so they run in <2s.
"""

from __future__ import annotations

from pathlib import Path

import duckdb
import pytest

SF_DIR = Path("/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _entry():
    import __spark_entry__ as entrymod

    return entrymod


def test_entry_module_imports():
    e = _entry()
    assert callable(e.entry)
    assert callable(e.queries)
    assert callable(e.oracle_sql)


def test_queries_complete_and_callable():
    e = _entry()
    qs = e.queries()
    assert len(qs) >= 63, f"queries() shrank to {len(qs)} entries"
    for name, fn in qs.items():
        assert callable(fn), f"{name} is not callable"


def test_oracle_keys_subset_of_queries():
    e = _entry()
    qs, oracles = e.queries(), e.oracle_sql()
    extra = set(oracles) - set(qs)
    assert not extra, f"oracle_sql() keys missing from queries(): {sorted(extra)}"
    assert all(isinstance(s, str) and s.strip() for s in oracles.values())


@pytest.mark.skipif(not SF_DIR.exists(), reason="testdata missing")
def test_every_oracle_sql_parses_in_duckdb():
    """EXPLAIN every oracle against sf0.001 views — catches SQL typos and
    ghost column references without paying for execution."""
    e = _entry()
    con = duckdb.connect()
    for t in TABLES:
        p = SF_DIR / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    bad = []
    for name, sql in e.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:  # noqa: BLE001
            bad.append(f"{name}: {exc}")
    assert not bad, "oracle SQL failed to plan:\n" + "\n".join(bad)


# Enforce the round-11 rotation: the driver's correctness gate grades a
# 50-entry PREFIX, and the prefix is an explicit list (ROUND11_PREFIX)
# leading with never/stale-verified entries so consecutive rounds'
# CORRECTNESS files jointly cover the whole inventory. This test pins
# the prefix so an accidental reorder (the round-3 failure mode) fails
# loudly here instead of silently rotating verdict coverage.


def test_registry_prefix_matches_rotation_plan():
    import __spark_entry__ as entrymod
    from rustic_witcher_spark.queries import (
        ROUND10_PREFIX,
        ROUND11_PREFIX,
        ROUND12_PREFIX_STAGED,
    )

    names = list(entrymod.queries())
    assert len(ROUND11_PREFIX) == 50
    assert names[: len(ROUND11_PREFIX)] == ROUND11_PREFIX, (
        "registry prefix diverged from ROUND11_PREFIX — the driver gate "
        "grades a 50-entry prefix; see build_registry() docstring"
    )
    assert len(names) == len(set(names))
    # r11 window composition: new r11 entries (if any) lead, then the
    # 23 r07-verdict holders (oldest verdicts), then r08 holders; the
    # 23 r07-aged names must ALL be in the window (the rotation's whole
    # point — after r11 the oldest verdict anywhere is r8)
    r07_aged = {
        "orders_pivot", "grouping_sets_revenue", "lineitem_unpivot",
        "fuzzy_part_names", "source_cap", "embedding_dim_stats",
        "weighted_reservoir", "benford_profile",
        "customer_revenue_standing", "zorder_layout", "bm25_search",
        "leakage_safe_split", "source_kl_divergence", "funnel_3step",
        "hard_negatives", "interval_coverage", "events_mad_outliers",
        "mixture_temperature", "ewma_events", "source_overlap",
        "bpe_merge_step", "dsir_selection", "pareto_suppliers",
    }
    assert r07_aged <= set(ROUND11_PREFIX)
    # rotation, not repeat: no overlap with the r10 window
    assert not set(ROUND11_PREFIX) & set(ROUND10_PREFIX)
    # the staged r12 window is consistent: 50 entries, all in the
    # registry, none overlapping the r11 window
    assert len(ROUND12_PREFIX_STAGED) == 50
    assert set(ROUND12_PREFIX_STAGED) <= set(names)
    assert not set(ROUND12_PREFIX_STAGED) & set(ROUND11_PREFIX)
