"""Laws for the generic Eventually combinator (Eventually.scala:1-221
semantics): exact-until-threshold accumulation, the exact->approx
transition under merge reordering, all four merge cases, roundtrip,
and the SetSize rebase staying wire-compatible."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from algebird_spark.sketches import (HLL, KLL, Eventually,
                                     IncompatibleSketchError, SetSize,
                                     TDigest, from_bytes)


def _ev_set(threshold=200):
    return Eventually(HLL(p=12), threshold, "set")


def _ev_list(threshold=200):
    return Eventually(KLL(k=200), threshold, "list")


# ------------------------------------------------------------- transitions
def test_stays_exact_at_threshold_converts_above():
    e = _ev_set(threshold=100)
    e.update_batch(np.arange(100))
    assert e.is_exact and e.estimate() == 100
    e.update_batch(np.array([100]))
    assert not e.is_exact


def test_exact_exact_merge_stays_exact_below_threshold():
    a, b = _ev_set(1000), _ev_set(1000)
    a.update_batch(np.arange(0, 300))
    b.update_batch(np.arange(200, 500))
    m = a + b
    assert m.is_exact and m.estimate() == 500  # exact distinct union


def test_all_four_merge_cases_agree_within_error():
    rng = np.random.default_rng(7)
    xs = rng.integers(0, 50_000, size=3_000)
    ys = rng.integers(25_000, 75_000, size=3_000)
    truth = len(np.union1d(xs, ys))

    thr = 4_000  # same threshold everywhere (merge_check requires it)

    def fresh(vals, convert):
        e = _ev_set(thr)
        e.update_batch(vals)
        if convert:
            e._convert()  # force the eventual side without more data
        assert e.is_exact == (not convert)
        return e

    # (exact, approx), (approx, exact), (approx, approx)
    for ca, cb in ((False, True), (True, False), (True, True)):
        a, b = fresh(xs, ca), fresh(ys, cb)
        est = (a + b).estimate()
        assert abs(est - truth) / truth < 0.05, (ca, cb, est, truth)
    a, b = fresh(xs, False), fresh(ys, False)
    m = a + b  # union (~5.7k distinct) crosses thr -> converts mid-merge
    assert not m.is_exact
    assert abs(m.estimate() - truth) / truth < 0.05
    big_a, big_b = _ev_set(10_000), _ev_set(10_000)
    big_a.update_batch(xs)
    big_b.update_batch(ys)
    assert (big_a + big_b).estimate() == truth  # both exact, stays exact


@given(data=st.lists(st.integers(0, 5_000), min_size=50, max_size=400),
       threshold=st.sampled_from([10, 100, 10_000]),
       seed=st.integers(0, 2**16))
@settings(max_examples=25, deadline=None)
def test_merge_reorder_invariance_across_transition(data, threshold, seed):
    """Random chunking + random merge order must agree with the
    single-pass build within HLL error, regardless of where the
    exact->approx conversion happens in the merge tree."""
    arr = np.array(data, dtype=np.int64)
    single = _ev_set(threshold)
    single.update_batch(arr)
    rng = np.random.default_rng(seed)
    n_chunks = rng.integers(2, 6)
    parts = []
    for idx in np.array_split(rng.permutation(arr), n_chunks):
        e = _ev_set(threshold)
        if idx.size:
            e.update_batch(idx)
        parts.append(e)
    rng.shuffle(parts)
    acc = parts[0]
    for p in parts[1:]:
        acc = acc + p
    truth = len(np.unique(arr))
    rel = 1.04 / np.sqrt(2**12) * 4  # generous HLL bound
    assert abs(acc.estimate() - truth) <= max(2.0, rel * truth)
    assert abs(single.estimate() - truth) <= max(2.0, rel * truth)


def test_list_mode_exact_quantiles_then_kll_bounds():
    rng = np.random.default_rng(11)
    vals = rng.normal(size=150)
    e = _ev_list(threshold=1000)
    e.update_batch(vals)
    assert e.is_exact
    lo, hi = e.quantile_bounds(0.5)
    assert lo == hi == e.quantile(0.5)
    e.update_batch(rng.normal(size=2_000))
    assert not e.is_exact and e.estimate() == 2_150
    lo, hi = e.quantile_bounds(0.5)
    assert lo <= e.quantile(0.5) <= hi and lo < hi


def test_roundtrip_both_states_and_both_modes():
    for make, vals in ((_ev_set, np.arange(50)),
                       (_ev_list, np.arange(50, dtype=np.float64))):
        e = make(100)
        e.update_batch(vals)
        r = from_bytes(e.to_bytes())
        assert r.is_exact and r._params() == e._params()
        assert r.estimate() == e.estimate()
        e.update_batch(np.arange(1_000))
        r2 = from_bytes(e.to_bytes())
        assert not r2.is_exact
        assert r2.estimate() == pytest.approx(e.estimate())
        # a decoded exact state can still convert and keep merging
        r.update_batch(np.arange(5_000))
        assert not r.is_exact


def test_incompatible_merges_raise():
    with pytest.raises(IncompatibleSketchError):
        _ev_list(10).merge_in_place(
            Eventually(TDigest(100), 10, "list"))
    with pytest.raises(IncompatibleSketchError):
        _ev_list(10).merge_in_place(Eventually(KLL(k=100), 10, "list"))
    with pytest.raises(IncompatibleSketchError):
        _ev_set(10).merge_in_place(_ev_set(11))
    with pytest.raises(IncompatibleSketchError):
        _ev_set(10).merge_in_place(SetSize(10))


# ------------------------------------------------------------ SetSize rebase
def test_setsize_is_eventually_and_keeps_wire_format():
    s = SetSize(max_set_size=100, p=12)
    assert isinstance(s, Eventually)
    s.update_batch(np.arange(50))
    blob = s.to_bytes()
    r = from_bytes(blob)
    assert isinstance(r, SetSize) and r.is_exact and r.size() == 50
    # payload layout unchanged from round 3: tag byte + sorted int64s
    assert blob.split(b"\x01", 1)[-1] == np.arange(50, dtype=np.int64).tobytes()
    s.update_batch(np.arange(10_000))
    r2 = from_bytes(s.to_bytes())
    assert not r2.is_exact and r2.hll is not None
    assert abs(r2.size() - 10_000) / 10_000 < 0.1


# ------------------------------------------- ADVICE r4: set-mode key hashing
def test_set_mode_hashes_same_keys_before_and_after_conversion():
    """Post-conversion update_batch must cast to int64 like the exact
    branch does — float inputs re-adding already-seen values must NOT
    double-count (ADVICE r4: estimate 4.0 -> 8.0 regression)."""
    e = _ev_set(threshold=3)
    e.update_batch(np.array([1.0, 2.0, 3.0, 4.0]))  # floats; converts
    assert not e.is_exact and e.estimate() == pytest.approx(4, abs=1)
    e.update_batch(np.array([1.0, 2.0, 3.0, 4.0]))  # same values again
    assert e.estimate() == pytest.approx(4, abs=1)
    # and int re-adds of float-added values agree too
    e.update_batch(np.arange(1, 5))
    assert e.estimate() == pytest.approx(4, abs=1)


def test_setsize_float_readd_after_conversion():
    """SetSize (rebased on Eventually) regained round-3 behavior:
    int64 canonicalization in BOTH phases."""
    s = SetSize(max_set_size=3, p=12)
    s.update_batch(np.array([10.0, 20.0, 30.0, 40.0]))
    assert not s.is_exact
    s.update_batch(np.array([10.0, 20.0, 30.0, 40.0]))
    assert s.size() == pytest.approx(4, abs=1)
