"""FrequentDirections laws: PSD shrink-only order, the ||A||_F^2/ell
spectral bound (including across arbitrary merge trees — the
Ghashami/Liberty/Phillips/Woodruff mergeability claim the distributed
harness rests on), exact recovery on low-rank input, serialization
round-trips, incompatible-merge failures."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from algebird_spark.sketches import (HLL, FrequentDirections,
                                     IncompatibleSketchError, from_bytes)

rng = np.random.default_rng(42)


def spec_err(A, sk):
    diff = A.T @ A - sk.gram()
    w = np.linalg.eigvalsh(diff)
    return w, float(np.abs(w).max())


def test_bound_and_psd_single_stream():
    d, ell = 32, 8
    A = rng.standard_normal((5000, d)) * np.linspace(5, 0.1, d)
    sk = FrequentDirections(d, ell)
    sk.update_batch(A)
    w, err = spec_err(A, sk)
    assert w.min() >= -1e-6 * sk.sq_frob      # B^T B <= A^T A
    assert err <= sk.error_bound() + 1e-9
    assert sk.n == 5000
    assert sk.sq_frob == pytest.approx(float((A * A).sum()), rel=1e-12)


def test_chunk_size_invariance_of_guarantees():
    """Harness requirement: splitting the stream into arbitrary chunks
    (the Arrow-batch coalescer does this) keeps every guarantee."""
    d, ell = 16, 6
    A = rng.standard_normal((1200, d))
    for sizes in ([1200], [1] * 50 + [1150], [7, 700, 493], [600, 600]):
        sk = FrequentDirections(d, ell)
        pos = 0
        for sz in sizes:
            sk.update_batch(A[pos:pos + sz])
            pos += sz
        assert pos == 1200
        w, err = spec_err(A, sk)
        assert w.min() >= -1e-6 * sk.sq_frob
        assert err <= sk.error_bound() + 1e-9


def test_merge_tree_keeps_bound():
    """Simulated topology: 16 partitions -> per-partition sketches ->
    bytes -> random two-level merge tree, as agg.sketch_global runs it."""
    d, ell = 24, 8
    A = rng.standard_normal((4096, d)) @ np.diag(np.linspace(3, 0.05, d))
    parts = np.array_split(A, 16)
    states = []
    for p in parts:
        sk = FrequentDirections(d, ell)
        sk.update_batch(p)
        states.append(sk.to_bytes())
    buckets = [from_bytes(states[0]), from_bytes(states[1])]
    for i, st in enumerate(states[2:]):
        buckets[i % 2].merge_in_place(from_bytes(st))
    buckets[0].merge_in_place(buckets[1])
    acc = buckets[0]
    assert acc.n == 4096
    w, err = spec_err(A, acc)
    assert w.min() >= -1e-6 * acc.sq_frob
    assert err <= acc.error_bound() + 1e-9


def test_exact_on_low_rank():
    """rank(A) < ell => the shrink cutoff sigma_ell^2 is 0 and the
    Gram estimate is EXACT."""
    d, ell, r = 20, 8, 5
    basis = rng.standard_normal((r, d))
    A = rng.standard_normal((800, r)) @ basis
    sk = FrequentDirections(d, ell)
    sk.update_batch(A)
    assert np.allclose(sk.gram(), A.T @ A, rtol=1e-8, atol=1e-6)


def test_flat_stream_reshape_and_misalignment():
    d, ell = 8, 4
    A = rng.standard_normal((100, d))
    sk_flat = FrequentDirections(d, ell)
    sk_flat.update_batch(A.reshape(-1))          # the Arrow kernel shape
    sk_mat = FrequentDirections(d, ell)
    sk_mat.update_batch(A)
    assert sk_flat.n == sk_mat.n == 100
    assert np.allclose(sk_flat.gram(), sk_mat.gram())
    with pytest.raises(ValueError, match="not a multiple"):
        FrequentDirections(d, ell).update_batch(np.zeros(d + 1))
    with pytest.raises(ValueError, match="dim rows"):
        FrequentDirections(d, ell).update_batch(np.zeros((3, d + 2)))


def test_null_rows_dropped_in_object_path():
    """The pandas/streaming path can hand None rows through; they must
    drop like the Arrow kernel's SQL null semantics, not crash."""
    d, ell = 6, 3
    A = rng.standard_normal((20, d))
    sk = FrequentDirections(d, ell)
    sk.update_batch(np.array([None, *list(A), None], dtype=object))
    ref = FrequentDirections(d, ell)
    ref.update_batch(A)
    assert sk.n == 20 and sk.sq_frob == pytest.approx(ref.sq_frob)
    empty = FrequentDirections(d, ell)
    empty.update_batch(np.array([None, None], dtype=object))
    assert empty.n == 0


def test_nonfinite_rows_dropped():
    d, ell = 6, 3
    A = rng.standard_normal((50, d))
    B = A.copy()
    B[7, 2] = np.nan
    B[31, 0] = np.inf
    sk = FrequentDirections(d, ell)
    sk.update_batch(B)
    assert sk.n == 48
    ref = FrequentDirections(d, ell)
    ref.update_batch(np.delete(A, [7, 31], axis=0))
    assert sk.sq_frob == pytest.approx(ref.sq_frob)


def test_serialization_roundtrip_and_identity():
    d, ell = 12, 5
    sk = FrequentDirections(d, ell)
    sk.update_batch(rng.standard_normal((300, d)))
    rt = from_bytes(sk.to_bytes())
    assert rt.n == sk.n and rt.sq_frob == sk.sq_frob
    assert np.array_equal(rt.present(), sk.present())
    zero = FrequentDirections(d, ell)
    merged = from_bytes(sk.to_bytes()).merge_in_place(zero)
    assert np.array_equal(merged.present(), sk.present())  # right identity
    z2 = FrequentDirections(d, ell)
    z2.merge_in_place(rt)
    assert np.array_equal(z2.present(), sk.present())      # left identity


def test_incompatible_merges_raise():
    a = FrequentDirections(8, 4)
    with pytest.raises(IncompatibleSketchError):
        a.merge_in_place(FrequentDirections(8, 5))
    with pytest.raises(IncompatibleSketchError):
        a.merge_in_place(FrequentDirections(9, 4))
    with pytest.raises(IncompatibleSketchError):
        a.merge_in_place(HLL(p=10))


def test_corrupt_payload_fails_loudly():
    sk = FrequentDirections(8, 4)
    sk.update_batch(rng.standard_normal((10, 8)))
    raw = bytearray(sk.to_bytes())
    with pytest.raises(ValueError, match="payload length"):
        from_bytes(bytes(raw[:-8]))


def test_bad_params():
    with pytest.raises(ValueError):
        FrequentDirections(0, 4)
    with pytest.raises(ValueError):
        FrequentDirections(8, 0)


@settings(max_examples=30, deadline=None)
@given(data=st.data(),
       n=st.integers(min_value=0, max_value=400),
       seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_property_random_chunkings_and_merge_trees(data, n, seed):
    """Hypothesis law (the reference's BaseProperties style): for ANY
    row count, ANY chunking into partitions, and ANY left-fold merge
    order over the partition sketches, both FD invariants hold against
    the exact Gram and the exact counters are preserved."""
    d, ell = 10, 4
    g = np.random.default_rng(seed)
    A = g.standard_normal((n, d)) * g.uniform(0.1, 5.0, size=d)
    cuts = sorted(data.draw(st.lists(
        st.integers(min_value=0, max_value=n), max_size=6))) + [n]
    parts, lo = [], 0
    for hi in cuts:
        parts.append(A[lo:hi])
        lo = hi
    parts.append(A[lo:])
    sks = []
    for p in parts:
        sk = FrequentDirections(d, ell)
        sk.update_batch(p)
        sks.append(from_bytes(sk.to_bytes()))
    order = data.draw(st.permutations(range(len(sks))))
    acc = sks[order[0]]
    for i in order[1:]:
        acc.merge_in_place(sks[i])
    assert acc.n == n
    assert acc.sq_frob == pytest.approx(float((A * A).sum()),
                                        rel=1e-9, abs=1e-9)
    diff = np.linalg.eigvalsh(A.T @ A - acc.gram())
    tol = 1e-6 * max(acc.sq_frob, 1.0)
    assert diff.min() >= -tol
    assert np.abs(diff).max() <= acc.error_bound() + tol


def test_sketch_global_over_array_column(spark):
    """End-to-end through the distributed harness: an array<float>
    column flattens in the Arrow kernel and FD reshapes it back; the
    result must satisfy both invariants vs the exact numpy Gram and
    count every vector exactly."""
    from algebird_spark.agg import sketch_global

    d, ell, n = 16, 6, 400
    A = rng.standard_normal((n, d)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, A[i].tolist()) for i in range(n)],
        "vec_id long, embedding array<float>").repartition(8)
    sk = sketch_global(df, "embedding", lambda: FrequentDirections(d, ell))
    assert sk.n == n
    A64 = A.astype(np.float64)
    w, err = spec_err(A64, sk)
    assert w.min() >= -1e-6 * sk.sq_frob
    assert err <= sk.error_bound() + 1e-9
    assert sk.sq_frob == pytest.approx(float((A64 * A64).sum()), rel=1e-9)


def test_ell_gt_d_rejected_loudly():
    # ADVICE r7: ell > d made _shrink a no-op (SVD has <= d singular
    # values) so update_batch's fill loop hung forever; must refuse at
    # construction instead.
    with pytest.raises(ValueError, match="ell"):
        FrequentDirections(d=4, ell=8)
    # ell == d stays legal (exact Gram) and terminates
    sk = FrequentDirections(d=4, ell=4)
    sk.update_batch(rng.standard_normal((64, 4)))
    assert sk.n == 64
