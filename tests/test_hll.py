"""HLL tests: monoid laws, error bound (3.5-sigma deterministic gate as
in algebird-test .../HyperLogLogTest.scala:294-302), sparse/dense,
serialization, downsize, intersection."""

import numpy as np
import pytest

from algebird_spark.sketches import HLL, bits_for_error, from_bytes


def build(p, values, chunks=1, seed_order=0):
    h = HLL(p=p)
    parts = np.array_split(np.asarray(values), chunks)
    if seed_order:
        rng = np.random.default_rng(seed_order)
        parts = [parts[i] for i in rng.permutation(len(parts))]
    for part in parts:
        h.update_batch(part)
    return h


@pytest.mark.parametrize("p", [9, 12, 14])
@pytest.mark.parametrize("n", [100, 5000, 200_000])
def test_error_bound(p, n):
    rng = np.random.default_rng(p * 1000 + n)
    vals = rng.integers(0, 2**31, size=n, dtype=np.int64).astype(np.int32)
    exact = len(np.unique(vals))
    h = build(p, vals)
    err = abs(h.estimate() - exact) / exact
    assert err <= 3.5 * 1.04 / np.sqrt(2**p), f"p={p} n={n} err={err}"


def test_partition_reorder_invariance():
    vals = np.arange(50_000, dtype=np.int32)
    a = build(12, vals, chunks=8, seed_order=1)
    b = build(12, vals, chunks=8, seed_order=2)
    c = build(12, vals, chunks=1)
    assert a.estimate() == b.estimate() == c.estimate()


def test_merge_associative_commutative_zero():
    rng = np.random.default_rng(3)
    xs = [rng.integers(0, 10_000, size=2000, dtype=np.int64).astype(np.int32)
          for _ in range(3)]
    hs = [build(12, x) for x in xs]
    ab_c = (hs[0] + hs[1]) + hs[2]
    a_bc = hs[0] + (hs[1] + hs[2])
    assert ab_c.to_bytes() == a_bc.to_bytes()
    ab = hs[0] + hs[1]
    ba = hs[1] + hs[0]
    assert ab.estimate() == ba.estimate()
    zero = HLL(p=12)
    assert (hs[0] + zero).estimate() == hs[0].estimate()
    assert (zero + hs[0]).estimate() == hs[0].estimate()


def test_sparse_to_dense_promotion_consistency():
    vals = np.arange(20_000, dtype=np.int32)
    h = HLL(p=14)
    assert h.is_sparse
    h.update_batch(vals[:10])
    assert h.is_sparse  # few registers -> stays sparse
    dense = HLL(p=14)
    dense.update_batch(vals)
    assert not dense.is_sparse
    # sparse subset merged into dense equals dense built with all
    h2 = HLL(p=14)
    h2.update_batch(vals[10:])
    merged = h + h2
    assert merged.estimate() == dense.estimate()


def test_serialization_roundtrip():
    for n in (5, 50_000):  # sparse and dense
        h = build(12, np.arange(n, dtype=np.int32))
        h2 = from_bytes(h.to_bytes())
        assert h2.estimate() == h.estimate()
        assert h2.to_bytes() == h.to_bytes()


def test_incompatible_merge_fails():
    from algebird_spark.sketches import IncompatibleSketchError
    a, b = HLL(p=10), HLL(p=12)
    with pytest.raises(IncompatibleSketchError):
        a.merge_in_place(b)


def test_downsize_matches_direct_build():
    vals = np.random.default_rng(5).integers(0, 2**30, size=100_000,
                                             dtype=np.int64).astype(np.int32)
    big = build(14, vals)
    down = big.downsize(10)
    direct = build(10, vals)
    # downsize must be *exact*: identical registers as direct build
    assert down.to_bytes() == direct.to_bytes()


def test_intersection():
    a_vals = np.arange(0, 60_000, dtype=np.int32)
    b_vals = np.arange(40_000, 100_000, dtype=np.int32)
    a, b = build(12, a_vals), build(12, b_vals)
    approx = HLL.intersection_size([a, b])
    true = 20_000
    assert approx.low <= true <= approx.high or abs(approx.estimate - true) / true < 0.15


def test_approximate_contains_exact():
    vals = np.arange(30_000, dtype=np.int32)
    h = build(14, vals)
    ap = h.approximate_size()
    assert ap.contains(30_000)


def test_bits_for_error():
    assert bits_for_error(0.0163) in (12, 13)
    assert 1.04 / np.sqrt(2 ** bits_for_error(0.01)) <= 0.01


def test_three_way_intersection():
    """n=3 exercises the recursive inclusion-exclusion branch
    (HyperLogLog.scala:626-644 is n-way; n=2 alone never recurses).
    Overlap design: A∩B∩C = [40k, 50k) -> true 10k."""
    a = build(12, np.arange(0, 50_000, dtype=np.int32))
    b = build(12, np.arange(40_000, 90_000, dtype=np.int32))
    c = build(12, np.arange(30_000, 60_000, dtype=np.int32))
    ap = HLL.intersection_size([a, b, c])
    true = 10_000
    # inclusion-exclusion at n=3 compounds the per-sketch error; the
    # reference documents accuracy only for small n / large overlap
    assert ap.low <= true <= ap.high or abs(ap.estimate - true) / true < 0.3
    # disjoint third set drives the estimate to ~0 (bounds clamp at 0)
    d = build(12, np.arange(900_000, 950_000, dtype=np.int32))
    ap0 = HLL.intersection_size([a, b, d])
    assert ap0.low == 0.0
    assert ap0.estimate <= 0.05 * 50_000
