"""Property-based correctness for the round-8 perceptual-hash media
dedup: the numpy kernel must agree with a slow pure-Python reference
on arbitrary byte strings (pinning the exact cell/comparison semantics
the DuckDB oracle replays), and the banded pair search must agree with
brute-force O(n²) enumeration on arbitrary fingerprint sets."""

from __future__ import annotations

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rustic_witcher_spark.operators.multimodal import perceptual_hash63

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

PURE_SETTINGS = dict(max_examples=200, deadline=None)


def _phash_reference(data: bytes, n_segments: int = 64) -> int:
    """Straight-from-the-docstring reference: cell of byte i is
    i*S//n; bit j set iff mean(cell j) > mean(cell j+1), integer
    cross-multiplied, missing cells contribute no comparisons."""
    n = len(data)
    if n == 0:
        return 0
    sums = [0] * n_segments
    cnts = [0] * n_segments
    for i, b in enumerate(data):
        s = i * n_segments // n
        sums[s] += b
        cnts[s] += 1
    out = 0
    for j in range(n_segments - 1):
        if cnts[j] and cnts[j + 1] and sums[j] * cnts[j + 1] > sums[j + 1] * cnts[j]:
            out |= 1 << j
    return out


@given(data=st.binary(min_size=0, max_size=400))
@settings(**PURE_SETTINGS)
def test_phash_kernel_matches_pure_python_reference(data):
    assert perceptual_hash63(data) == _phash_reference(data)


@given(data=st.binary(min_size=1, max_size=300), pos=st.integers(min_value=0, max_value=10**6), delta=st.integers(min_value=1, max_value=255))
@settings(**PURE_SETTINGS)
def test_phash_one_byte_edit_bounded_bit_damage(data, pos, delta):
    """A one-byte edit changes one cell's mean → can flip only the ≤2
    comparisons adjacent to that cell. This is the recall guarantee the
    planted-twin fixture relies on."""
    pos %= len(data)
    edited = bytearray(data)
    edited[pos] = (edited[pos] + delta) % 256
    if bytes(edited) == data:
        return
    d = bin(perceptual_hash63(data) ^ perceptual_hash63(bytes(edited))).count("1")
    assert d <= 2


hash_sets = st.lists(
    st.integers(min_value=0, max_value=(1 << 63) - 1), min_size=1, max_size=20, unique=True
)


@given(hs=hash_sets, max_h=st.integers(min_value=0, max_value=4))
@settings(**SETTINGS)
def test_hamming_banding_matches_brute_force(spark, hs, max_h):
    from rustic_witcher_spark.operators.dedup import hamming_near_duplicates

    df = spark.createDataFrame([(i, h) for i, h in enumerate(hs)], "doc_id long, ph long")
    got = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_near_duplicates(df, "doc_id", "ph", max_hamming=max_h).collect()
    )
    want = sorted(
        (i, j, bin(a ^ b).count("1"))
        for (i, a), (j, b) in combinations(enumerate(hs), 2)
        if bin(a ^ b).count("1") <= max_h
    )
    assert got == want


# ---------------------------------------------------------------------------
# exclusion_top1_block vs naive reference (contrastive negative leg)
# ---------------------------------------------------------------------------


@settings(**SETTINGS)
@given(data=st.data())
def test_exclusion_kernel_matches_naive_reference(spark, data):
    """The exclusion-aware block kernel must agree with a from-scratch
    O(anchors × corpus) Python reference on arbitrary vector sets and
    arbitrary exclusion lists — including exclusions covering the whole
    corpus (anchor drops out) and empty exclusion lists."""
    import math

    from rustic_witcher_spark.operators.similarity import (
        _round_half_away,
        exclusion_top1_block,
    )

    n = data.draw(st.integers(min_value=2, max_value=10))
    dim = data.draw(st.integers(min_value=2, max_value=4))
    vecs = [
        [data.draw(st.integers(min_value=-3, max_value=3)) * 0.5 + 0.25 for _ in range(dim)]
        for _ in range(n)
    ]
    # keep vectors non-degenerate: zero-norm rows are a documented
    # drop class tested separately
    vecs = [v if any(abs(x) > 1e-9 for x in v) else [1.0] + v[1:] for v in vecs]
    n_anchors = data.draw(st.integers(min_value=1, max_value=min(3, n)))
    excl = {
        a: sorted(set(data.draw(st.lists(st.integers(min_value=0, max_value=n - 1), max_size=n))))
        for a in range(n_anchors)
    }

    corpus = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    anchors = spark.createDataFrame(
        [(a, vecs[a], excl[a]) for a in range(n_anchors)],
        "anchor_id long, __qv array<double>, __ex array<long>",
    )
    got = {
        r["anchor_id"]: (r["neighbor_id"], r["sim"])
        for r in exclusion_top1_block(corpus, anchors).collect()
    }

    want = {}
    for a in range(n_anchors):
        banned = set(excl[a]) | {a}
        best = None
        qa = vecs[a]
        qn = math.sqrt(sum(x * x for x in qa))
        for c in range(n):
            if c in banned:
                continue
            cv = vecs[c]
            cn = math.sqrt(sum(x * x for x in cv))
            sim = float(_round_half_away(sum(x * y for x, y in zip(qa, cv)) / (qn * cn)))
            if best is None or sim > best[1] or (sim == best[1] and c < best[0]):
                best = (c, sim)
        if best is not None:
            want[a] = best
    assert got == want
