"""MultiSketch composite laws (VERDICT r4 next #8): merge behavior
under partition reordering and arbitrary merge-tree shapes, loud
failure on heterogeneous component configs (the CountMinSketch.scala
:117-120 depth/width-compatibility parity, lifted to the composite),
and Eventually components living inside a MultiSketch across the
exact->approx transition."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from algebird_spark.sketches import (CMS, HLL, KLL, BloomFilter, Eventually,
                                     IncompatibleSketchError, MultiSketch,
                                     TDigest, from_bytes)


def _factory():
    return MultiSketch({
        "hll": HLL(p=12),
        "cms": CMS(eps=0.005, delta=1e-4),
        "kll": KLL(k=200),
        "tdigest": TDigest(100),
        "bloom": BloomFilter(num_entries=20_000, fp_prob=0.01),
    })


def _build_parts(xs, n_parts):
    parts = []
    for sl in np.array_split(xs, n_parts):
        m = _factory()
        m.update_batch(sl)
        parts.append(from_bytes(m.to_bytes()))  # wire roundtrip per part
    return parts


def _merge_in_order(parts, order):
    acc = parts[order[0]]
    for i in order[1:]:
        acc = acc + parts[i]  # non-destructive merge
    return acc


@given(seed=st.integers(0, 10_000), n_parts=st.integers(2, 6),
       order_seed=st.integers(0, 10_000))
@settings(max_examples=15, deadline=None)
def test_merge_reordering_preserves_every_component(seed, n_parts,
                                                    order_seed):
    rng = np.random.default_rng(seed)
    xs = rng.integers(0, 5_000, size=4_000)
    truth_distinct = len(np.unique(xs))
    parts = _build_parts(xs, n_parts)

    perm = np.random.default_rng(order_seed).permutation(n_parts)
    a = _merge_in_order(parts, list(range(n_parts)))
    b = _merge_in_order(parts, perm.tolist())

    # idempotent/exact-sum components are BYTE-equal across orders
    assert a["hll"].to_bytes() == b["hll"].to_bytes()
    assert a["bloom"].to_bytes() == b["bloom"].to_bytes()
    assert a["cms"].to_bytes() == b["cms"].to_bytes()

    # quantile sketches may compact differently by order, but both
    # orders must satisfy their published bounds vs the exact data
    for m in (a, b):
        est = m["hll"].estimate()
        assert abs(est - truth_distinct) <= 3.5 * m["hll"].error * truth_distinct
        for p in (0.25, 0.5, 0.75):
            lo, hi = m["kll"].quantile_bounds(p)
            exact = np.quantile(xs, p, method="inverted_cdf")
            assert lo - 1e-9 <= exact <= hi + 1e-9
        # CMS never underestimates any key
        keys = np.unique(xs[:100])
        exact_counts = np.array([(xs == k).sum() for k in keys])
        assert (m["cms"].frequencies(keys) >= exact_counts - 1e-9).all()


def test_heterogeneous_component_config_fails_loudly():
    """Mismatched component params must raise, not silently merge —
    the composite inherits every component's own compatibility check
    (CountMinSketch.scala:117-120: '++ requires the same depth/width'
    parity)."""
    base = MultiSketch({"h": HLL(p=12), "k": KLL(k=200)})
    wrong_param = MultiSketch({"h": HLL(p=14), "k": KLL(k=200)})
    wrong_kind = MultiSketch({"h": KLL(k=200), "k": KLL(k=200)})
    wrong_names = MultiSketch({"h": HLL(p=12), "x": KLL(k=200)})
    for other in (wrong_param, wrong_kind, wrong_names):
        with pytest.raises(IncompatibleSketchError):
            base.merge_in_place(other)
    # and the failure is atomic enough to be loud BEFORE a partial
    # merge corrupts state: name mismatch is caught by the composite's
    # own params check
    with pytest.raises(IncompatibleSketchError):
        MultiSketch({"a": HLL(p=12)}).merge_in_place(
            MultiSketch({"b": HLL(p=12)}))


@given(seed=st.integers(0, 10_000), threshold=st.integers(50, 2_000))
@settings(max_examples=10, deadline=None)
def test_eventually_inside_multisketch(seed, threshold):
    """Eventually components compose into MultiSketch and survive
    chunked build + wire roundtrip + merge across the exact->approx
    transition, agreeing with truth within the approx sketch's error
    either side of the threshold."""
    rng = np.random.default_rng(seed)
    xs = rng.integers(0, 3_000, size=2_500)
    truth_distinct = len(np.unique(xs))

    def factory():
        return MultiSketch({
            "ev_set": Eventually(HLL(p=12), threshold, "set"),
            "ev_list": Eventually(KLL(k=200), threshold, "list"),
            "hll": HLL(p=12),
        })

    parts = []
    for sl in np.array_split(xs, 4):
        m = factory()
        m.update_batch(sl)
        parts.append(from_bytes(m.to_bytes()))
    rng.shuffle(parts)
    merged = parts[0]
    for p in parts[1:]:
        merged = merged + p

    est = merged["ev_set"].estimate()
    tol = 3.5 * 1.04 / np.sqrt(2**12) * truth_distinct + 1e-9
    assert abs(est - truth_distinct) <= tol
    assert merged["ev_list"].n_total == len(xs)
    lo, hi = merged["ev_list"].quantile_bounds(0.5)
    exact_med = np.quantile(xs, 0.5, method="inverted_cdf")
    assert lo - 1e-9 <= exact_med <= hi + 1e-9
    # roundtrip of the merged composite preserves the Eventually states
    rt = from_bytes(merged.to_bytes())
    assert rt["ev_set"].estimate() == est
    assert rt["ev_set"].is_exact == merged["ev_set"].is_exact

    # threshold mismatch inside the composite fails loudly
    with pytest.raises(IncompatibleSketchError):
        factory().merge_in_place(MultiSketch({
            "ev_set": Eventually(HLL(p=12), threshold + 1, "set"),
            "ev_list": Eventually(KLL(k=200), threshold, "list"),
            "hll": HLL(p=12),
        }))


# ------------------------------------------------ SketchMapHLL monoid laws
@given(seed=st.integers(0, 5_000),
       eps=st.sampled_from([0.02, 0.05]),
       p=st.integers(6, 10))
@settings(max_examples=15, deadline=None)
def test_sketchmap_hll_monoid_laws(seed, eps, p):
    """Register-max cells form an idempotent commutative monoid:
    associativity, commutativity, idempotence, and zero identity all
    hold BYTE-exactly (unlike count-valued sketches there is no
    float-order concern)."""
    from algebird_spark.sketches import SketchMapHLL, from_bytes

    rng = np.random.default_rng(seed)

    def build(n):
        s = SketchMapHLL(eps=eps, delta=0.05, p=p)
        s.update_batch(rng.integers(0, 30, size=n).astype(np.int64),
                       rng.integers(0, 500, size=n).astype(np.int64))
        return s

    a, b, c = build(400), build(300), build(200)
    ab_c = ((a + b) + c).table
    a_bc = (a + (b + c)).table
    assert np.array_equal(ab_c, a_bc)                      # associative
    assert np.array_equal((a + b).table, (b + a).table)    # commutative
    assert np.array_equal((a + a).table, a.table)          # idempotent
    zero = SketchMapHLL(eps=eps, delta=0.05, p=p)
    assert np.array_equal((a + zero).table, a.table)       # identity
    # wire roundtrip preserves the table and the hh estimates
    rt = from_bytes(a.to_bytes())
    assert np.array_equal(rt.table, a.table)
    assert rt.heavy_hitters() == a.heavy_hitters()
