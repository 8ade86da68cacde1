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


# Enforce the round-4 registry freeze: the driver's correctness gate
# grades a 50-entry PREFIX, so reordering silently changes which
# operators get driver verdicts. New entries may be APPENDED to their
# logical subgroup (shifting later groups back is fine and expected);
# the relative order of existing entries must never change.
FROZEN_ORDER_R4 = [
    "filter_contains", "filter_startswith", "filter_endswith",
    "filter_startsends", "filter_equals", "filter_anyofint",
    "filter_anyofstring", "anonymize_customer", "anonymize_supplier",
    "anonymize_orders", "faker_suite", "fake_multi_email",
    "fake_email_id_prefix", "sanitize_null_bytes", "keep_num_of_records",
    "cdc_upsert", "agg_max_pk", "validation_check", "datadiff_check",
    "dedup_exact", "minhash_signatures", "minhash_lsh_candidates",
    "simhash", "simhash_near_dups", "dedup_clusters",
    "ngram_jaccard_adjacent", "knn_bruteforce", "knn_lsh", "knn_ivf",
    "embedding_near_dups", "embedding_project", "semdedup",
    "stratified_sample", "weighted_sample", "mixture_sample",
    "pack_sequences", "training_shards", "hll_users", "heavy_hitters",
    "bloom_probe", "decontaminate", "unigram_nll", "chunk_dedup",
    "media_metadata", "multimodal_features", "text_stats", "text_langid",
    "text_fingerprint", "token_count_bpe", "vocab_top_terms",
]


def test_registry_order_frozen():
    import __spark_entry__ as entrymod

    names = list(entrymod.queries())
    existing = [n for n in names if n in set(FROZEN_ORDER_R4)]
    assert existing == FROZEN_ORDER_R4, (
        "registry order changed for pre-freeze entries — the driver "
        "gate grades a 50-entry prefix; see build_registry() docstring"
    )
