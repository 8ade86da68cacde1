"""Property-based tests (hypothesis) — what the reference's test suite
lacks (SURVEY §5): adversarial inputs against the engine's invariants.

Each property draws a BATCH of arbitrary strings and runs ONE Spark job
over the whole batch (per-example Spark jobs would be prohibitively
slow), so shrinking still works at batch granularity.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rustic_witcher_spark.functions import fake
from rustic_witcher_spark.operators import packing, transforms
from rustic_witcher_spark.operators.dedup import char_shingles, normalized_text

SEED = 42
SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

texts = st.lists(st.text(max_size=60), min_size=1, max_size=40)

EMAIL_RE = re.compile(r"^[a-z]+\.[a-z]+\d{1,3}@[a-z.]+$")


@pytest.fixture(scope="module")
def mk(spark):
    def make(vals):
        return spark.createDataFrame([(i, v) for i, v in enumerate(vals)], ["i", "v"])

    return make


@given(vals=texts)
@settings(**SETTINGS)
def test_fake_email_format_and_determinism(mk, vals):
    df = mk(vals)
    out = df.select("i", "v", fake.fake_email(F.col("v"), SEED).alias("e1"), fake.fake_email(F.col("v"), SEED).alias("e2"))
    by_input: dict[str, str] = {}
    for r in out.collect():
        assert r["e1"] == r["e2"]  # same expression twice -> same value
        assert EMAIL_RE.match(r["e1"]), r["e1"]  # always email-shaped
        if r["v"] in by_input:
            assert by_input[r["v"]] == r["e1"]  # same input -> same output
        by_input[r["v"]] = r["e1"]


@given(vals=texts)
@settings(**SETTINGS)
def test_fake_email_partitioning_invariant(mk, vals):
    df = mk(vals)
    one = {(r["i"], r["e"]) for r in df.coalesce(1).select("i", fake.fake_email(F.col("v"), SEED).alias("e")).collect()}
    many = {(r["i"], r["e"]) for r in df.repartition(8).select("i", fake.fake_email(F.col("v"), SEED).alias("e")).collect()}
    assert one == many


@given(vals=texts)
@settings(**SETTINGS)
def test_fake_phone_structure_preserved(mk, vals):
    df = mk(vals)
    for r in df.select("v", fake.fake_phone(F.col("v"), SEED).alias("p")).collect():
        v, p = r["v"], r["p"]
        if len(v) <= 1:
            assert p == v  # reference keeps len<=1 strings verbatim
            continue
        assert len(p) == len(v)
        for cv, cp in zip(v, p):
            if cv.isdigit() and cv.isascii():
                assert cp.isdigit() and cp != cv  # digit -> different digit
            else:
                assert cp == cv  # structure/punctuation untouched


@given(vals=st.lists(st.text(alphabet=st.characters(min_codepoint=0, max_codepoint=127), max_size=30), min_size=1, max_size=40))
@settings(**SETTINGS)
def test_sanitize_null_bytes_property(mk, vals):
    df = mk(vals)
    for r in transforms.sanitize_null_bytes(df).collect():
        orig = vals[r["i"]]
        if "\x00" in orig:
            assert r["v"] is None  # whole cell nulled, never truncated
        else:
            assert r["v"] == orig  # byte-faithful passthrough


@given(vals=texts, k=st.integers(min_value=2, max_value=8))
@settings(**SETTINGS)
def test_char_shingles_invariants(mk, vals, k):
    df = mk(vals)
    rows = df.select("i", normalized_text(F.col("v")).alias("n"), char_shingles(F.col("v"), k).alias("sh")).collect()
    for r in rows:
        n, sh = r["n"], r["sh"]
        assert len(sh) == len(set(sh))  # distinct
        if len(n) <= k:
            assert sh == [n]  # short text -> single whole-text shingle
        else:
            assert len(sh) <= len(n) - k + 1
            assert all(len(s) == k for s in sh)
            assert set(sh) == {n[i : i + k] for i in range(len(n) - k + 1)}


@given(vals=texts)
@settings(**SETTINGS)
def test_pii_redact_idempotent(mk, vals):
    """Redacting twice equals redacting once: placeholders contain no
    digits or '@', so they can never re-match any PII pattern."""
    from rustic_witcher_spark.operators.quality import pii_redact

    df = mk(vals)
    out = df.select(
        pii_redact(F.col("v")).alias("once"),
        pii_redact(pii_redact(F.col("v"))).alias("twice"),
    )
    for r in out.collect():
        assert r["once"] == r["twice"]


@given(vals=st.lists(st.text(st.characters(min_codepoint=32, max_codepoint=126), max_size=60), min_size=1, max_size=40))
@settings(**SETTINGS)
def test_top_token_fraction_matches_counter(mk, vals):
    """The sorted-array max-run trick equals the obvious Counter mode.

    ASCII inputs only: Java/RE2 '\\s' is ASCII-only while Python's re
    matches Unicode whitespace (e.g. NEL), so a full-Unicode emulation
    would test Python's regex dialect, not the operator."""
    from collections import Counter

    from rustic_witcher_spark.operators.quality import top_token_fraction

    df = mk(vals)
    got = {r["i"]: r["f"] for r in df.select("i", top_token_fraction(F.col("v")).alias("f")).collect()}
    for i, v in enumerate(vals):
        # exact emulation of normalized_text: Spark trim() strips ASCII
        # spaces only, then Java \s+ (ASCII) collapses
        norm = re.sub(r"[\t\n\x0b\f\r ]+", " ", (v or "").strip(" ").lower())
        toks = norm.split(" ") if norm else []
        want = 0.0 if not toks else round(Counter(toks).most_common(1)[0][1] / len(toks), 6)
        assert abs(got[i] - want) < 1e-9, (v, got[i], want)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 20), st.text(max_size=20), st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False, width=32))),
        min_size=1, max_size=30, unique_by=lambda t: t[0],
    )
)
@settings(**SETTINGS)
def test_table_diff_self_is_empty(spark, rows):
    from rustic_witcher_spark.operators.diff import table_diff

    df = spark.createDataFrame(rows, "k int, v string, x float")
    assert table_diff(df, df, ["k"]).count() == 0


# ------------------------------------------------------- round-4 operators


@given(
    counts=st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=60),
    budget=st.integers(min_value=16, max_value=1024),
    block=st.sampled_from([1, 3, 16, 64]),
    scan_threshold=st.sampled_from([2, 7, packing.SCAN_THRESHOLD]),
)
@settings(**SETTINGS)
def test_pack_sequences_equals_naive_cumsum(spark, counts, budget, block, scan_threshold):
    """The k-level distributed prefix scan equals the sequential cumsum
    for ANY sizes/budget/block/threshold — including block=1 (one block
    per id), blocks larger than the corpus, and thresholds small enough
    to force multi-level recursion."""
    df = spark.createDataFrame(list(enumerate(counts)), "doc_id long, n long").repartition(7)
    got = {
        r["doc_id"]: (r["start_offset"], r["seq_id"])
        for r in packing.pack_sequences(
            df, "doc_id", "n", budget, block=block, scan_threshold=scan_threshold
        ).collect()
    }
    off = 0
    for i, n in enumerate(counts):
        assert got[i] == (off, off // budget), (i, block, budget, scan_threshold)
        off += n


@given(
    weights=st.lists(st.floats(min_value=0.01, max_value=100.0, allow_nan=False), min_size=2, max_size=50),
    k=st.integers(min_value=1, max_value=10),
)
@settings(**SETTINGS)
def test_weighted_sample_subset_and_size(spark, weights, k):
    """A-ES sample: exactly min(k, n) rows, all from the input, stable
    across two runs (pure function of corpus + seed)."""
    from rustic_witcher_spark.operators.sampling import weighted_sample_topk

    df = spark.createDataFrame(list(enumerate(weights)), "k long, w double")
    got1 = sorted(r["k"] for r in weighted_sample_topk(df, "k", "w", k).collect())
    got2 = sorted(r["k"] for r in weighted_sample_topk(df, "k", "w", k).collect())
    assert got1 == got2
    assert len(got1) == min(k, len(weights))
    assert set(got1) <= set(range(len(weights)))
