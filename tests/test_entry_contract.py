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


# Enforce the round-10 rotation: the driver's correctness gate grades a
# 50-entry PREFIX, and the prefix is an explicit list (ROUND10_PREFIX)
# leading with never/stale-verified entries so consecutive rounds'
# CORRECTNESS files jointly cover the whole inventory. This test pins
# the prefix so an accidental reorder (the round-3 failure mode) fails
# loudly here instead of silently rotating verdict coverage.


def test_registry_prefix_matches_rotation_plan():
    import __spark_entry__ as entrymod
    from rustic_witcher_spark.queries import ROUND10_PREFIX, ROUND11_PREFIX_STAGED

    names = list(entrymod.queries())
    assert len(ROUND10_PREFIX) == 50
    assert names[: len(ROUND10_PREFIX)] == ROUND10_PREFIX, (
        "registry prefix diverged from ROUND10_PREFIX — the driver gate "
        "grades a 50-entry prefix; see build_registry() docstring"
    )
    assert len(names) == len(set(names))
    # r10 window composition: the twelve r10 additions lead, then the
    # registry's only never-driver-verified entry (the r9 red, fixed),
    # then the ten r06-verdict deferrals, then 27 r07 holders
    assert ROUND10_PREFIX[:13] == [
        "pq_index_query", "novelty_incremental", "embedding_int8_quant",
        "ann_incremental", "media_incremental", "pq_residual_query",
        "pq_rerank_query", "bigram_nll", "zipf_fit", "hll_set_ops",
        "bigram_nll_oov", "semantic_decontam",
        "feature_hash_embed",
    ]
    assert "filter_startswith" in ROUND10_PREFIX[13:23]
    assert "faker_suite" in ROUND10_PREFIX[13:23]
    # the staged r11 window is consistent: 50 entries, all in the
    # registry, none overlapping the r10 window (rotation, not repeat)
    assert len(ROUND11_PREFIX_STAGED) == 50
    assert set(ROUND11_PREFIX_STAGED) <= set(names)
    assert not set(ROUND11_PREFIX_STAGED) & set(ROUND10_PREFIX)
