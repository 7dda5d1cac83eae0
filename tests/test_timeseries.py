"""DecayedValue, ExpHist, HLLSeries tests (algebird DecayedValue.scala,
ExpHist.scala, HyperLogLogSeries.scala semantics)."""

import math

import numpy as np

from algebird_spark.sketches import from_bytes
from algebird_spark.sketches.timeseries import DecayedValue, ExpHist, HLLSeries


def test_decayed_value_halflife():
    d = DecayedValue(half_life=10.0)
    d.add(8.0, ts=0.0)
    assert abs(d.value_at(10.0) - 4.0) < 1e-12  # one half-life
    d2 = DecayedValue(half_life=10.0)
    d2.add(4.0, ts=10.0)
    d.merge_in_place(d2)
    assert abs(d.value_at(10.0) - 8.0) < 1e-12


def test_decayed_value_commutative_late_data():
    a = DecayedValue(10.0)
    a.add(1.0, 0.0)
    a.add(1.0, 20.0)
    b = DecayedValue(10.0)
    b.add(1.0, 20.0)
    b.add(1.0, 0.0)  # late arrival
    assert abs(a.value_at(20.0) - b.value_at(20.0)) < 1e-12
    rt = from_bytes(a.to_bytes())
    assert rt.value_at(20.0) == a.value_at(20.0)


def test_decayed_value_batch():
    d = DecayedValue(100.0)
    pairs = np.array([[1.0, t] for t in range(50)])
    d.update_batch(pairs)
    exact = sum(2.0 ** ((t - 49) / 100.0) for t in range(50))
    assert abs(d.value_at(49.0) - exact) < 1e-9


def test_exphist_relative_error():
    eh = ExpHist(epsilon=0.05, window=1000.0)
    ts = np.arange(5000, dtype=np.float64)
    eh.update_batch(ts)
    true_count = 1000  # events in (3999, 4999]
    est = eh.guess()
    assert abs(est - true_count) / true_count <= 0.06
    # bounded state
    assert len(eh.buckets) <= eh.k * 24 + 24


def test_exphist_merge_and_roundtrip():
    a = ExpHist(0.1, 100.0)
    b = ExpHist(0.1, 100.0)
    a.update_batch(np.arange(0, 50, dtype=np.float64))
    b.update_batch(np.arange(50, 100, dtype=np.float64))
    a.merge_in_place(from_bytes(b.to_bytes()))
    est = a.guess()
    assert abs(est - 100) / 100 <= 0.15
    rt = from_bytes(a.to_bytes())
    assert rt.guess() == a.guess()


def test_hllseries_since():
    hs = HLLSeries(p=12)
    early = np.arange(0, 3000, dtype=np.int64)
    late = np.arange(3000, 4000, dtype=np.int64)
    hs.update_batch(early, np.full(len(early), 100.0))
    hs.update_batch(late, np.full(len(late), 200.0))
    err = 3.5 * 1.04 / math.sqrt(2 ** 12)
    all_est = hs.since(0.0).estimate()
    late_est = hs.since(150.0).estimate()
    assert abs(all_est - 4000) / 4000 <= err
    assert abs(late_est - 1000) / 1000 <= err


def test_hllseries_merge_roundtrip():
    a, b = HLLSeries(p=10), HLLSeries(p=10)
    a.update_batch(np.arange(1000, dtype=np.int64), np.full(1000, 1.0))
    b.update_batch(np.arange(500, 1500, dtype=np.int64), np.full(1000, 2.0))
    a.merge_in_place(from_bytes(b.to_bytes()))
    est = a.since(0.0).estimate()
    assert abs(est - 1500) / 1500 <= 3.5 * 1.04 / math.sqrt(2 ** 10)
    est2 = a.since(1.5).estimate()
    assert abs(est2 - 1000) / 1000 <= 3.5 * 1.04 / math.sqrt(2 ** 10)


def test_decayed_vector():
    from algebird_spark.sketches.timeseries import DecayedVector
    d = DecayedVector(dim=3, half_life=10.0)
    d.update_batch(np.array([[8.0, 4.0, 0.0]]), np.array([0.0]))
    assert np.allclose(d.value_at(10.0), [4.0, 2.0, 0.0])
    o = DecayedVector(dim=3, half_life=10.0)
    o.update_batch(np.array([[4.0, 0.0, 2.0]]), np.array([10.0]))
    d.merge_in_place(from_bytes(o.to_bytes()))
    assert np.allclose(d.value_at(10.0), [8.0, 2.0, 2.0])


def test_exphist_canonical_form_invariants():
    from algebird_spark.sketches.timeseries import _canonical_counts
    for total in [1, 2, 3, 5, 17, 100, 12345, 10**9]:
        for k in [1, 2, 5, 20]:
            c = _canonical_counts(total, k)
            assert int((c * (1 << np.arange(len(c)))).sum()) == total
            assert (c[:-1] >= k).all() and (c[:-1] <= k + 1).all()
            assert 1 <= c[-1] <= k + 1


def test_exphist_batch_update_is_vectorized():
    """1M-event batch must go through the l-canonical rebuild (ExpHist
    .scala:287-434 analog), not a per-event insert loop: >= 1M events/s
    and the epsilon bound still holds."""
    import time
    rng = np.random.default_rng(1)
    big = rng.uniform(0, 1e6, size=1_000_000)
    eh = ExpHist(epsilon=0.01, window=5e5)
    t0 = time.perf_counter()
    eh.update_batch(big)
    dt = time.perf_counter() - t0
    exact = int((big > big.max() - 5e5).sum())
    assert abs(eh.guess() - exact) / exact <= 0.012
    assert dt < 1.0, f"1M-event batch took {dt:.2f}s — update path regressed"


def test_exphist_unsorted_and_chunked_matches_bound():
    ts = np.arange(5000, dtype=np.float64)
    np.random.default_rng(0).shuffle(ts)
    eh = ExpHist(epsilon=0.05, window=1000.0)
    for chunk in np.array_split(ts, 7):
        eh.update_batch(chunk)
    assert abs(eh.guess() - 1000) / 1000 <= 0.06
    sizes = [s for s, _ in eh.buckets]
    from collections import Counter
    per_size = Counter(sizes)
    assert all(n <= eh.k + 1 for n in per_size.values())
