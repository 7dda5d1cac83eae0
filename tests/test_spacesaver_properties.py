"""SpaceSaver (Metwally et al. StreamSummary) property laws under
random data, chunking, and merge order — the published guarantees:

* estimate >= true count for every tracked item (one-sided);
* estimate - error <= true count (the error brackets the truth);
* any item with true count > N/capacity is tracked (the frequent-item
  guarantee survives merges with summed error bounds);
* serialization is canonical and roundtrips."""

import numpy as np
from hypothesis import given, settings, strategies as st

from algebird_spark.sketches import SpaceSaver, from_bytes


def _build_chunked(arr, capacity, seed):
    rng = np.random.default_rng(seed)
    parts = []
    for sl in np.array_split(rng.permutation(arr), rng.integers(1, 6)):
        s = SpaceSaver(capacity)
        if sl.size:
            s.update_batch(sl)
        parts.append(s)
    rng.shuffle(parts)
    acc = parts[0]
    for p in parts[1:]:
        acc = acc + p
    return acc


@given(data=st.lists(st.integers(0, 40), min_size=1, max_size=600),
       capacity=st.sampled_from([4, 8, 16, 64]),
       seed=st.integers(0, 2**16))
@settings(max_examples=60, deadline=None)
def test_bounds_and_frequent_item_guarantee(data, capacity, seed):
    arr = np.array(data, dtype=np.int64)
    truth = {int(k): int(n) for k, n in
             zip(*np.unique(arr, return_counts=True))}
    s = _build_chunked(arr, capacity, seed)
    n_total = len(arr)
    rows = s.top_k(len(s.counters))
    for item, c, e, guaranteed in rows:
        t = truth.get(int(item), 0)
        assert c >= t, (item, c, t)            # never under
        assert c - e <= t, (item, c, e, t)     # error brackets truth
    tracked = {int(i) for i, *_ in rows}
    for k, t in truth.items():
        if t > n_total / capacity:             # the SpaceSaver guarantee
            assert k in tracked, (k, t, n_total, capacity)


@given(data=st.lists(st.integers(0, 30), min_size=1, max_size=300),
       seed=st.integers(0, 2**16))
@settings(max_examples=40, deadline=None)
def test_exact_when_under_capacity(data, seed):
    """With capacity >= distinct items every count is exact with zero
    error regardless of chunking/merge order."""
    arr = np.array(data, dtype=np.int64)
    truth = {int(k): int(n) for k, n in
             zip(*np.unique(arr, return_counts=True))}
    s = _build_chunked(arr, 64, seed)
    for item, c, e, guaranteed in s.top_k(len(s.counters)):
        assert e == 0 and c == truth[int(item)] and guaranteed


@given(data=st.lists(st.integers(0, 50), min_size=1, max_size=400),
       seed=st.integers(0, 2**16))
@settings(max_examples=30, deadline=None)
def test_serialization_canonical_roundtrip(data, seed):
    arr = np.array(data, dtype=np.int64)
    s = _build_chunked(arr, 8, seed)
    blob = s.to_bytes()
    r = from_bytes(blob)
    assert r.to_bytes() == blob
    assert r.top_k(8) == s.top_k(8)
