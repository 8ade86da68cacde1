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


# Enforce the round-12 rotation: the driver's correctness gate grades a
# 50-entry PREFIX, and the prefix is an explicit list (ROUND12_PREFIX)
# leading with never/stale-verified entries so consecutive rounds'
# CORRECTNESS files jointly cover the whole inventory. This test pins
# the prefix so an accidental reorder (the round-3 failure mode) fails
# loudly here instead of silently rotating verdict coverage.


def test_registry_prefix_matches_rotation_plan():
    import __spark_entry__ as entrymod
    from rustic_witcher_spark.queries import (
        ROUND11_PREFIX,
        ROUND12_PREFIX,
        ROUND13_PREFIX_STAGED,
    )

    names = list(entrymod.queries())
    assert len(ROUND12_PREFIX) == 50
    assert names[: len(ROUND12_PREFIX)] == ROUND12_PREFIX, (
        "registry prefix diverged from ROUND12_PREFIX — the driver gate "
        "grades a 50-entry prefix; see build_registry() docstring"
    )
    assert len(names) == len(set(names))
    # r12 window composition: the three r12 additions lead, then the
    # eight r08-aged entries the r11 additions displaced — the oldest
    # verdicts after r11 — which must ALL be in the window (the
    # rotation's whole point: after r12 the oldest verdict is r9)
    assert ROUND12_PREFIX[:9] == [
        "attribution_incremental", "drift_incremental", "histogram_incremental",
        "k_anonymity_lattice", "join_skew_probe",
        "basket_rules", "fd_audit",
        "ab_test_summary", "value_trend_ols",
    ]
    r08_aged_displaced = {
        "skew_salted_stats", "doc_length_deciles", "value_percentiles",
        "token_count_bpe", "vocab_top_terms", "langid_confusion",
        "tfidf_top_terms", "doc_quality",
    }
    assert r08_aged_displaced <= set(ROUND12_PREFIX)
    # rotation, not repeat: no overlap with the r11 window
    assert not set(ROUND12_PREFIX) & set(ROUND11_PREFIX)
    # the staged r13 window is consistent: 50 entries, all in the
    # registry, none overlapping the r12 window, led by the five
    # entries the r12 additions displaced (they stay r9-aged)
    assert len(ROUND13_PREFIX_STAGED) == 50
    assert set(ROUND13_PREFIX_STAGED) <= set(names)
    assert not set(ROUND13_PREFIX_STAGED) & set(ROUND12_PREFIX)
    assert ROUND13_PREFIX_STAGED[:9] == [
        "keep_num_of_records", "agg_max_pk",
        "validation_check", "datadiff_check", "dedup_exact",
        "anonymize_orders", "sanitize_null_bytes",
        "filter_anyofstring", "anonymize_supplier",
    ]
