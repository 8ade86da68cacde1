"""Round-10 additions: the list-typed-column gate rejection (the r9
feature_hash_embed lesson — the local gate must fail what the driver
fails), the feature-hash string-serialization convention, and the new
steady-state ANN / incremental-novelty registry entries."""

from __future__ import annotations

import importlib.util
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

REPO = Path(__file__).resolve().parent.parent

_spec = importlib.util.spec_from_file_location(
    "compare_oracle", REPO / "scripts" / "compare_oracle.py"
)
compare_oracle = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(compare_oracle)

container_cols = compare_oracle.container_cols


# ---------------------------------------------------------------------------
# gate self-tests: list-typed result columns must be REJECTED
# ---------------------------------------------------------------------------


def test_gate_rejects_list_typed_columns():
    """The r9 red's root cause: the driver canonicalizer dies on
    container cells (TypeError: unhashable type: 'list'). The local
    gate must flag the SCHEMA, not normalize through it — a deliberate
    array-returning frame is non-canonicalizable."""
    pdf = pd.DataFrame({"doc_id": [1, 2], "fh": [[0.1, 0.2], [0.3, 0.4]]})
    assert container_cols(pdf) == ["fh"]
    # numpy arrays (what Spark toPandas actually yields) too
    pdf2 = pd.DataFrame({"k": [1], "v": [np.array([1.0, 2.0])]})
    assert container_cols(pdf2) == ["v"]


def test_gate_rejection_scans_past_leading_nulls():
    """A container column can lead with NULLs — a head()-only scan
    would miss it and burn a driver slot anyway."""
    pdf = pd.DataFrame({"k": [1, 2, 3], "v": [None, None, [1.0]]})
    assert container_cols(pdf) == ["v"]


def test_gate_accepts_scalar_frames():
    pdf = pd.DataFrame({"k": ["a", None], "n": [1, 2], "x": [1.5, float("nan")]})
    assert container_cols(pdf) == []


def test_containment_salted_cap_keeps_exact_lowest_ids(spark):
    """The r10 salted two-level posting cap must keep EXACTLY the
    ``max_posting`` lowest-id members per gram — identical semantics to
    the r9 single-window form, just with bounded task size. Pin by
    comparing capped vs uncapped output on a corpus with one
    boilerplate gram owned by many docs."""
    from rustic_witcher_spark.operators import dedup

    # 40 docs all sharing one boilerplate sentence (one hot gram set),
    # plus per-doc unique content so docs aren't wholesale identical
    rows = [(i, f"common boilerplate legal terms apply here uniq{i} tail{i * 7}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = dedup.containment_near_duplicates(docs, "text", "doc_id", max_posting=5)
    # every surviving doc id in capped pairs must be among the 5
    # lowest ids (the hot grams' posting lists keep ids 0..4)
    ids = {r["id_a"] for r in capped.collect()} | {r["id_b"] for r in capped.select("id_b").collect()}
    assert ids and ids <= set(range(5)), ids
    # and the capped pair set over the low-id docs matches the uncapped
    # operator restricted to those docs (lowest-id cap ≡ subset filter
    # when every gram's owners are id-ordered the same way)
    low = dedup.containment_near_duplicates(
        docs.filter("doc_id < 5"), "text", "doc_id", max_posting=None
    )
    a = sorted((r["id_a"], r["id_b"], r["n_inter"]) for r in capped.collect())
    b = sorted((r["id_a"], r["id_b"], r["n_inter"]) for r in low.collect())
    assert a == b


def test_registry_returns_no_container_columns(spark):
    """Structural sweep: EVERY registry entry's result schema must be
    canonicalizable by the driver — no ArrayType / MapType / StructType
    top-level columns anywhere. Schema-only (no execution), so the
    whole inventory checks in seconds; the class that shipped
    feature_hash_embed red cannot re-enter."""
    from pyspark.sql import types as T

    from rustic_witcher_spark.queries import build_registry

    sf_dir = "/root/testdata/sf0.001"
    bad = []
    for name, (fn, _) in build_registry().items():
        schema = fn(spark, sf_dir).schema
        for f in schema.fields:
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
                bad.append((name, f.name, f.dataType.simpleString()))
    assert not bad, f"non-canonicalizable result columns: {bad}"
