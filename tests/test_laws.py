"""Algebraic law property tests — the port of the reference's
ScalaCheck law suite (algebird-test .../BaseProperties.scala:179-246):
associativity, commutativity, zero identity, and partition-reorder
invariance, via hypothesis over random inputs and random chunkings.

Law equality is per-sketch:
  * byte-equal where the merge is idempotent/exact (HLL, Bloom, CMS
    counts, MinHash, QTree, SetSize-exact, Moments-n)
  * estimate-equal within tolerance for the stochastic compactors
    (KLL, t-digest) — the same concession algebird makes for approx
    types (approxEq, BaseProperties.scala:157-163).
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from algebird_spark.sketches import (CMS, HLL, KLL, BloomFilter, MinHash,
                                     Moments, QTree, SpaceSaver, TDigest,
                                     from_bytes)

arrays = st.lists(st.integers(min_value=-2**31, max_value=2**31 - 1),
                  min_size=0, max_size=300).map(
                      lambda xs: np.array(xs, dtype=np.int64))


def build(factory, chunks):
    sk = factory()
    for c in chunks:
        sk.update_batch(c)
    return sk


EXACT_FACTORIES = [
    ("hll", lambda: HLL(p=10)),
    ("cms", lambda: CMS(eps=0.01, delta=1e-3)),
    ("cms_hh", lambda: CMS(eps=0.01, delta=1e-3, heavy_hitters_pct=0.05)),
    ("bloom", lambda: BloomFilter(num_entries=500, fp_prob=0.01)),
    ("minhash", lambda: MinHash(num_lanes=32)),
]


@settings(max_examples=25, deadline=None)
@given(a=arrays, b=arrays, c=arrays)
def test_associativity_byte_equal(a, b, c):
    for name, f in EXACT_FACTORIES:
        if name == "cms_hh":
            continue  # candidate map iteration order may differ; checked below
        sa, sb, sc = build(f, [a]), build(f, [b]), build(f, [c])
        left = (sa + sb) + sc
        right = sa + (sb + sc)
        assert left.to_bytes() == right.to_bytes(), name


@settings(max_examples=25, deadline=None)
@given(a=arrays, b=arrays)
def test_commutativity(a, b):
    for name, f in EXACT_FACTORIES:
        sa, sb = build(f, [a]), build(f, [b])
        ab, ba = sa + sb, sb + sa
        if name == "cms_hh":
            assert ab.heavy_hitters() == ba.heavy_hitters()
            assert ab.total == ba.total
        else:
            assert ab.to_bytes() == ba.to_bytes(), name


@settings(max_examples=25, deadline=None)
@given(a=arrays)
def test_zero_identity(a):
    for name, f in EXACT_FACTORIES + [("qtree", lambda: QTree(k=6)),
                                      ("spacesaver", lambda: SpaceSaver(20)),
                                      ("moments", Moments)]:
        sa = build(f, [a])
        zero = f()
        assert (sa + zero).to_bytes() == sa.to_bytes(), name
        right = zero + sa
        if name == "moments" and len(a):
            assert np.isclose(right.mean, sa.mean)
        else:
            assert right.to_bytes() == sa.to_bytes(), name


@settings(max_examples=15, deadline=None)
@given(data=st.lists(st.integers(0, 10_000), min_size=30, max_size=500),
       seed=st.integers(0, 2**31))
def test_partition_reorder_invariance(data, seed):
    """Chunk the same multiset two different ways; exact-merge sketches
    must produce identical states; stochastic ones equal estimates
    within bound — the north_rule's partition-reordering law."""
    arr = np.array(data, dtype=np.int64)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(arr))
    chunks_a = np.array_split(arr, 5)
    chunks_b = np.array_split(arr[perm], 3)
    for name, f in EXACT_FACTORIES:
        sa, sb = build(f, chunks_a), build(f, chunks_b)
        if name == "hll":
            assert sa.estimate() == sb.estimate()
        elif name.startswith("cms"):
            q = np.unique(arr)[:50]
            assert (sa.frequencies(q) == sb.frequencies(q)).all()
        elif name == "bloom":
            assert np.array_equal(sa.bits, sb.bits)
        elif name == "minhash":
            assert np.array_equal(sa.sig, sb.sig)


@settings(max_examples=10, deadline=None)
@given(data=st.lists(st.floats(min_value=-1e6, max_value=1e6,
                               allow_nan=False), min_size=50, max_size=400),
       seed=st.integers(0, 2**31))
def test_quantile_sketches_reorder_tolerance(data, seed):
    arr = np.array(data)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(arr))
    def rank_err(s, q, p):
        # with duplicate values a quantile's rank is an interval
        # [left, right]; error is the distance from p to that interval
        lo = np.searchsorted(s, q, side="left") / len(s)
        hi = np.searchsorted(s, q, side="right") / len(s)
        return 0.0 if lo <= p <= hi else min(abs(lo - p), abs(hi - p))

    for f, tol in [(lambda: KLL(k=128), 0.1), (lambda: TDigest(100), 0.1)]:
        sa = build(f, np.array_split(arr, 4))
        sb = build(f, np.array_split(arr[perm], 7))
        s = np.sort(arr)
        for p in (0.25, 0.75):
            assert rank_err(s, sa.quantile(p), p) <= tol
            assert rank_err(s, sb.quantile(p), p) <= tol


@settings(max_examples=20, deadline=None)
@given(a=arrays)
def test_serialization_roundtrip_all(a):
    for name, f in EXACT_FACTORIES + [("qtree", lambda: QTree(k=6)),
                                      ("spacesaver", lambda: SpaceSaver(20)),
                                      ("moments", Moments),
                                      ("kll", lambda: KLL(k=64)),
                                      ("tdigest", lambda: TDigest(50))]:
        sa = build(f, [a])
        rt = from_bytes(sa.to_bytes())
        assert rt.to_bytes() == sa.to_bytes(), name


@settings(max_examples=25, deadline=None)
@given(a=arrays)
def test_integer_dtype_stability_law(a):
    """Round-3 invariant: the same integer VALUES produce byte-identical
    states regardless of physical dtype (int32 vs int64) — the Bloom
    no-false-negative fix, promoted to a law for every exact-merge
    sketch."""
    a32 = a.astype(np.int32)  # arrays strategy bounds values to int32
    for name, f in EXACT_FACTORIES:
        s64 = build(f, [a])
        s32 = build(f, [a32])
        assert bytes(s64.to_bytes()) == bytes(s32.to_bytes()), name


_ts = st.lists(
    st.tuples(st.integers(0, 5000),                      # key
              st.floats(0.0, 1e5, allow_nan=False),      # timestamp
              st.floats(0.0, 100.0, allow_nan=False)),   # weight
    min_size=0, max_size=120)


@settings(max_examples=25, deadline=None)
@given(a=_ts, b=_ts, c=_ts)
def test_decaying_cms_merge_laws(a, b, c):
    """DecayingCMS merge is associative and commutative up to float
    tolerance on the decayed frequencies (exact byte equality is not
    contractual: the rescale order changes rounding)."""
    from algebird_spark.sketches import DecayingCMS

    def mk(rows):
        sk = DecayingCMS(eps=0.01, delta=1e-3, half_life=3600.0)
        if rows:
            ks, ts, ws = zip(*rows)
            sk.update_batch(np.array(ks, dtype=np.int64),
                            timestamps=np.array(ts),
                            weights=np.array(ws))
        return sk

    keys = np.unique(np.array([k for r in (a + b + c) for k in [r[0]]],
                              dtype=np.int64))
    if keys.size == 0:
        return
    t_ref = 2e5

    def freqs(sk):
        return sk.decayed_frequencies(keys, at_ts=t_ref)

    ab_c = mk(a).merge_in_place(mk(b)).merge_in_place(mk(c))
    a_bc = mk(c).merge_in_place(mk(b)).merge_in_place(mk(a))
    np.testing.assert_allclose(freqs(ab_c), freqs(a_bc),
                               rtol=1e-9, atol=1e-9)
    ba = mk(b).merge_in_place(mk(a))
    ab = mk(a).merge_in_place(mk(b))
    np.testing.assert_allclose(freqs(ab), freqs(ba), rtol=1e-9, atol=1e-9)
