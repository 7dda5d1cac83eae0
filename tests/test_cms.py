"""CMS tests: eps/delta guarantee (Hoeffding-style acceptance as in
algebird-test .../ApproximateProperty.scala:60-109 and
CountMinSketchTest.scala:319-413), heavy-hitter semantics (:560-561),
merge laws, sparse-exact mode, serialization."""

import numpy as np
import pytest

from algebird_spark.sketches import CMS, from_bytes


def zipf_tokens(n, vocab, a=1.1, seed=0):
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(a, size=n * 2)
    ranks = ranks[ranks <= vocab][:n]
    return ranks.astype(np.int64)


def test_guarantee_never_underestimates_and_eps_bound():
    eps, delta = 0.005, 1e-4
    vals = zipf_tokens(200_000, 50_000, seed=1)
    c = CMS(eps=eps, delta=delta)
    for chunk in np.array_split(vals, 7):
        c.update_batch(chunk)
    assert not c.is_sparse
    keys, exact = np.unique(vals, return_counts=True)
    sample = np.random.default_rng(2).choice(len(keys), size=2000, replace=False)
    est = c.frequencies(keys[sample])
    exact_s = exact[sample]
    assert (est >= exact_s).all(), "CMS must never underestimate"
    n = c.total
    violations = int((est > exact_s + eps * n).sum())
    # delta=1e-4 over 2000 queries -> expected ~0.2 violations; allow Hoeffding slack
    assert violations <= 5


def test_sparse_exact_mode():
    c = CMS(eps=0.01, delta=0.01)
    vals = np.array([1, 1, 2, 3, 3, 3], dtype=np.int64)
    c.update_batch(vals)
    assert c.is_sparse
    assert c.frequency(3).estimate == 3.0
    assert c.frequency(1).estimate == 2.0
    assert c.frequency(999).estimate == 0.0
    assert c.total == 6


def test_sparse_to_dense_equivalence():
    vals = zipf_tokens(10_000, 5_000, seed=3)
    dense = CMS(eps=0.005, delta=1e-3)
    dense.update_batch(vals)  # unique count > max_exact -> dense
    sparse_then = CMS(eps=0.005, delta=1e-3)
    for chunk in np.array_split(vals, 100):
        sparse_then.update_batch(chunk)
    q = np.unique(vals)[:500]
    assert (dense.frequencies(q) == sparse_then.frequencies(q)).all()


def test_merge_matches_single_build():
    vals = zipf_tokens(50_000, 10_000, seed=4)
    single = CMS(eps=0.002, delta=1e-4)
    single.update_batch(vals)
    parts = np.array_split(vals, 5)
    merged = CMS(eps=0.002, delta=1e-4)
    for p in parts:
        c = CMS(eps=0.002, delta=1e-4)
        c.update_batch(p)
        merged.merge_in_place(c)
    q = np.unique(vals)[:1000]
    assert (single.frequencies(q) == merged.frequencies(q)).all()
    assert single.total == merged.total


def test_merge_associativity_bytes():
    parts = [zipf_tokens(5_000, 2_000, seed=s) for s in range(3)]
    cs = [CMS(eps=0.01, delta=1e-3) for _ in range(3)]
    for c, p in zip(cs, parts):
        c.update_batch(p)
    ab_c = (cs[0] + cs[1]) + cs[2]
    a_bc = cs[0] + (cs[1] + cs[2])
    assert ab_c.to_bytes() == a_bc.to_bytes()


def test_heavy_hitters_toppct():
    # 100 hot tokens + uniform tail (FIXTURES.md adversarial design)
    rng = np.random.default_rng(6)
    hot = np.repeat(np.arange(100, dtype=np.int64), 10_000)
    tail = rng.integers(1000, 1_000_000, size=200_000, dtype=np.int64)
    vals = np.concatenate([hot, tail])
    rng.shuffle(vals)
    pct, eps = 0.005, 0.001
    c = CMS(eps=eps, delta=1e-4, heavy_hitters_pct=pct)
    merged = CMS(eps=eps, delta=1e-4, heavy_hitters_pct=pct)
    for chunk in np.array_split(vals, 9):
        part = CMS(eps=eps, delta=1e-4, heavy_hitters_pct=pct)
        part.update_batch(chunk)
        merged.merge_in_place(part)
        c.update_batch(chunk)
    n = c.total
    keys, counts = np.unique(vals, return_counts=True)
    must_have = set(keys[counts >= pct * n].tolist())
    allowed = set(keys[counts >= (pct - eps) * n].tolist())
    for sk in (c, merged):
        hh = set(sk.heavy_hitters().keys())
        assert must_have <= hh, f"missing true heavy hitters: {must_have - hh}"
        assert hh <= allowed, f"spurious heavy hitters: {hh - allowed}"


def test_inner_product_and_f2():
    a_vals = np.repeat(np.arange(10, dtype=np.int64), 100)
    b_vals = np.repeat(np.arange(5, 15, dtype=np.int64), 50)
    a = CMS(eps=0.001, delta=1e-4)
    b = CMS(eps=0.001, delta=1e-4)
    a.update_batch(a_vals)
    b.update_batch(b_vals)
    true_ip = 5 * 100 * 50  # overlap tokens 5..9
    ip = a.inner_product(b)
    assert ip.estimate >= true_ip
    assert ip.estimate <= true_ip + 0.001 * a.total * b.total
    f2 = a.f2()
    assert f2.estimate >= 10 * 100 * 100


def test_serialization_roundtrip():
    for n in (10, 50_000):
        c = CMS(eps=0.01, delta=1e-3, heavy_hitters_pct=0.01)
        c.update_batch(zipf_tokens(n, 20_000, seed=8))
        c2 = from_bytes(c.to_bytes())
        assert c2.total == c.total
        assert c2.to_bytes() == c.to_bytes()
        q = np.arange(100, dtype=np.int64)
        assert (c2.frequencies(q) == c.frequencies(q)).all()


def test_topn_cms_semantics_and_documented_bias():
    """TopNCMS parity (TopNLogic, CountMinSketch.scala:1084-1106,
    1212-1238): keeps the top-n candidates by estimated count; the
    dominant key always survives merges; the merge-order bias at the
    margins is documented behavior, not an error."""
    import numpy as np
    from algebird_spark.sketches import CMS, from_bytes
    rng = np.random.default_rng(9)
    # skewed stream: key 1 dominates
    data = np.concatenate([np.full(5000, 1), rng.integers(2, 500, size=5000)])
    rng.shuffle(data)
    parts = []
    for chunk in np.array_split(data, 4):
        sk = CMS(eps=0.005, delta=1e-4, heavy_hitters_n=5)
        sk.update_batch(chunk)
        parts.append(sk.to_bytes())
    merged = from_bytes(parts[0])
    for b in parts[1:]:
        merged.merge_in_place(from_bytes(b))
    hh = merged.heavy_hitters()
    assert len(hh) <= 5
    assert 1 in hh and next(iter(hh)) == 1  # dominant key, ranked first
    assert hh[1] >= 5000                    # never underestimates
    with pytest.raises(ValueError):
        CMS(heavy_hitters_pct=0.01, heavy_hitters_n=5)


def test_cms_params_for_groups_budget_and_bounds():
    """Preset sizing (SCALE.md §3/§8): the dense tables for n_groups
    sketches fit the byte budget, the eps bound still holds on real
    updates, and impossible budgets degrade delta before width."""
    import math
    from algebird_spark.sketches import cms_params_for_groups

    p = cms_params_for_groups(10**6, 8 * 2**30, delta=1e-6)
    c = CMS(**p)
    assert c.depth * c.width * 8 * 10**6 <= 8 * 2**30
    assert c.delta <= 1e-6 + 1e-12
    # a group's estimates still obey the one-sided eps bound
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 500, size=20_000)
    c.update_batch(vals)
    ks, cnt = np.unique(vals, return_counts=True)
    est = c.frequencies(ks)
    assert (est >= cnt).all()
    assert (est <= cnt + p["eps"] * len(vals) * 1.0 + 1e-9).all()

    # tiny budget: depth relaxes (delta grows) before width drops below 32
    q = cms_params_for_groups(10**6, 10**6 * 32 * 8, delta=1e-6)
    cq = CMS(**q)
    assert cq.width >= 32 and cq.depth >= 1
    assert cq.depth * cq.width * 8 <= 32 * 8 * 14  # bounded table

    import pytest
    with pytest.raises(ValueError):
        cms_params_for_groups(0, 100)
