"""Hypothesis property laws for the two sketches with the most
hand-rolled state code (VERDICT r3 next-round #10):

* ExpHist — l-canonical form invariants (every filled size below the
  top has k or k+1 buckets; sizes are powers of two; bucket
  timestamps newest-first), the DGIM epsilon bound vs an exact
  sliding-window count, and merge/chunking invariance of the bound.
* HLLSeries — prune keeps the (rho, ts) pareto frontier exactly,
  merge is associative/commutative/idempotent under partition
  reordering, and since(t) matches a from-scratch HLL built on the
  suffix of events at/after t.
"""

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from algebird_spark.sketches import HLL, ExpHist, HLLSeries, from_bytes
from algebird_spark.sketches.timeseries import _canonical_counts

# --------------------------------------------------------------- ExpHist


@given(total=st.integers(1, 10**12), k=st.integers(1, 64))
@settings(max_examples=300, deadline=None)
def test_canonical_counts_invariants(total, k):
    counts = _canonical_counts(total, k)
    sizes = 1 << np.arange(len(counts), dtype=np.int64)
    # decomposition is exact
    assert int((counts * sizes).sum()) == total
    # every filled size below the top has k or k+1 buckets
    assert all(k <= c <= k + 1 for c in counts[:-1])
    # the top size has 1..k+1 buckets
    assert 1 <= counts[-1] <= k + 1


@given(ts=st.lists(st.floats(0, 10_000, allow_nan=False), min_size=1,
                   max_size=300),
       epsilon=st.sampled_from([0.5, 0.2, 0.1, 0.05]),
       window=st.sampled_from([100.0, 1_000.0, 20_000.0]),
       seed=st.integers(0, 2**16))
@settings(max_examples=60, deadline=None)
def test_exphist_epsilon_bound_under_chunking_and_merge(ts, epsilon,
                                                        window, seed):
    """guess() within epsilon of the exact windowed count, for a
    single build AND for a random chunking merged in random order."""
    arr = np.array(ts, dtype=np.float64)
    now = float(arr.max())
    exact = int((arr >= now - window).sum())

    def check(e):
        # canonical structure holds on the live state too
        sizes = [s for s, _ in e.buckets]
        assert all(s & (s - 1) == 0 for s in sizes)  # powers of two
        tss = [t for _, t in e.buckets]
        assert tss == sorted(tss, reverse=True)      # newest first
        got = e.guess()
        assert abs(got - exact) <= max(1.0, epsilon * exact) + 1e-9, \
            (got, exact)

    single = ExpHist(epsilon, window)
    single.update_batch(arr)
    check(single)

    rng = np.random.default_rng(seed)
    parts = []
    for chunk in np.array_split(rng.permutation(arr),
                                rng.integers(2, 5)):
        e = ExpHist(epsilon, window)
        if chunk.size:
            e.update_batch(chunk)
        parts.append(e)
    rng.shuffle(parts)
    acc = parts[0]
    for p in parts[1:]:
        acc = acc + p
    check(acc)
    check(from_bytes(acc.to_bytes()))


@given(ts=st.lists(st.floats(0, 1_000, allow_nan=False), min_size=1,
                   max_size=100))
@settings(max_examples=40, deadline=None)
def test_exphist_expiry_never_counts_stale_events(ts):
    """Events older than the window at ingest time never contribute."""
    e = ExpHist(0.1, window=10.0)
    e.update_batch(np.array(ts))
    now = max(ts)
    exact = sum(1 for t in ts if t >= now - 10.0)
    assert e.guess() <= exact * 1.1 + 1
    # total bucket mass never exceeds the number of in-window events
    assert sum(s for s, _ in e.buckets) <= exact


# -------------------------------------------------------------- HLLSeries

_events = st.lists(
    st.tuples(st.integers(0, 5_000), st.floats(0, 100, allow_nan=False)),
    min_size=1, max_size=400)


@given(events=_events)
@settings(max_examples=40, deadline=None)
def test_hllseries_prune_is_pareto_frontier(events):
    vals = np.array([v for v, _ in events], dtype=np.int64)
    tss = np.array([t for _, t in events], dtype=np.float64)
    s = HLLSeries(p=6)
    s.update_batch(vals, tss)
    for reg in s.rows.values():
        items = sorted(reg.items())  # by rho ascending
        # strictly decreasing ts as rho increases: anything else is
        # dominated and must have been pruned
        ts_list = [t for _, t in items]
        assert all(ts_list[i] > ts_list[i + 1]
                   for i in range(len(ts_list) - 1)), items


@given(events=_events, seed=st.integers(0, 2**16),
       t_frac=st.floats(0.0, 1.0))
@settings(max_examples=40, deadline=None)
def test_hllseries_since_matches_suffix_hll_under_reordering(events, seed,
                                                             t_frac):
    """since(t) of a randomly chunked + randomly merged series must
    EQUAL (same registers, same estimate) a plain HLL built from
    scratch on only the events with ts >= t."""
    vals = np.array([v for v, _ in events], dtype=np.int64)
    tss = np.array([t for _, t in events], dtype=np.float64)
    t = float(tss.min() + t_frac * (tss.max() - tss.min()))

    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(vals))
    parts = []
    for sl in np.array_split(perm, rng.integers(2, 5)):
        s = HLLSeries(p=6)
        if sl.size:
            s.update_batch(vals[sl], tss[sl])
        parts.append(s)
    rng.shuffle(parts)
    acc = parts[0]
    for p in parts[1:]:
        acc = acc + p

    suffix = vals[tss >= t]
    ref = HLL(p=6)
    if suffix.size:
        ref.update_batch(suffix)
    got = acc.since(t)
    assert got.estimate() == ref.estimate()
    # serialization round-trip preserves every since() answer
    rt = from_bytes(acc.to_bytes())
    assert rt.since(t).estimate() == ref.estimate()


@given(events=_events)
@settings(max_examples=25, deadline=None)
def test_hllseries_merge_idempotent_and_commutative(events):
    vals = np.array([v for v, _ in events], dtype=np.int64)
    tss = np.array([t for _, t in events], dtype=np.float64)
    a = HLLSeries(p=6)
    a.update_batch(vals, tss)
    b = HLLSeries(p=6)
    b.update_batch(vals[: len(vals) // 2], tss[: len(vals) // 2])
    assert (a + a).to_bytes() == a.to_bytes()          # idempotent
    assert (a + b).to_bytes() == (b + a).to_bytes()    # commutative
    assert (a + b).to_bytes() == a.to_bytes()          # absorbs subset
