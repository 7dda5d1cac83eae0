"""KLL + t-digest tests: rank error within published bounds, QTree-style
(lower, upper) bounds contain the true quantile (QTreeTest.scala:55-122
design), merge ~ single build, serialization."""

import numpy as np
import pytest

from algebird_spark.sketches import KLL, TDigest, from_bytes, kll_rank_error

PS = [0.0, 0.05, 0.25, 0.5, 0.777, 0.95, 1.0]


def datasets():
    rng = np.random.default_rng(42)
    return {
        "uniform": rng.uniform(0, 1000, size=100_000),
        "lognormal": rng.lognormal(4, 1, size=100_000),
        "ints": rng.integers(0, 500, size=100_000).astype(np.float64),
    }


def true_rank(data, v):
    return np.searchsorted(np.sort(data), v, side="right") / len(data)


@pytest.mark.parametrize("name,data", list(datasets().items()))
def test_kll_rank_error(name, data):
    k = 200
    sk = KLL(k=k)
    for chunk in np.array_split(data, 13):
        sk.update_batch(chunk)
    eps = kll_rank_error(k)
    for p in PS:
        q = sk.quantile(p)
        rerr = abs(true_rank(data, q) - p)
        assert rerr <= 2 * eps, f"{name} p={p} rank err {rerr} > {2*eps}"


@pytest.mark.parametrize("name,data", list(datasets().items()))
def test_kll_bounds_contain_truth(name, data):
    sk = KLL(k=200)
    sk.update_batch(data)
    s = np.sort(data)
    for p in [0.05, 0.5, 0.95]:
        lo, hi = sk.quantile_bounds(p)
        truth = s[min(int(p * len(s)), len(s) - 1)]
        assert lo <= truth <= hi, f"{name} p={p}: {lo} <= {truth} <= {hi}"


def test_kll_merge_close_to_single():
    data = np.random.default_rng(1).lognormal(3, 1, size=200_000)
    merged = KLL(k=200)
    for part in np.array_split(data, 16):
        sk = KLL(k=200)
        sk.update_batch(part)
        merged.merge_in_place(sk)
    assert merged.n == len(data)
    eps = kll_rank_error(200)
    for p in [0.1, 0.5, 0.9]:
        q = merged.quantile(p)
        assert abs(true_rank(data, q) - p) <= 3 * eps


def test_kll_min_max_exact():
    data = np.random.default_rng(2).normal(size=50_000)
    sk = KLL(k=128)
    sk.update_batch(data)
    assert sk.quantile(0.0) == data.min()
    assert sk.quantile(1.0) == data.max()


def test_kll_serialization():
    sk = KLL(k=160)
    sk.update_batch(np.random.default_rng(3).uniform(size=30_000))
    sk2 = from_bytes(sk.to_bytes())
    assert sk2.n == sk.n
    assert sk2.quantile(0.5) == sk.quantile(0.5)


@pytest.mark.parametrize("name,data", list(datasets().items()))
def test_tdigest_rank_error(name, data):
    td = TDigest(compression=200)
    for chunk in np.array_split(data, 9):
        td.update_batch(chunk)
    for p in PS:
        q = td.quantile(p)
        rerr = abs(true_rank(data, q) - p)
        # t-digest rank error is quantile-dependent; 0.015 is conservative
        # for delta=200 at the midrange, tighter at tails
        gate = 0.005 + 0.02 * min(p, 1 - p)
        assert rerr <= gate, f"{name} p={p} rank err {rerr} > {gate}"


def test_tdigest_merge_close_to_single():
    data = np.random.default_rng(4).lognormal(3, 1, size=200_000)
    merged = TDigest(compression=200)
    for part in np.array_split(data, 16):
        td = TDigest(compression=200)
        td.update_batch(part)
        merged.merge_in_place(td)
    assert merged.n == len(data)
    for p in [0.05, 0.5, 0.95]:
        q = merged.quantile(p)
        assert abs(true_rank(data, q) - p) <= 0.03


def test_tdigest_tails_exact():
    data = np.random.default_rng(5).uniform(size=100_000)
    td = TDigest(compression=100)
    td.update_batch(data)
    assert td.quantile(0.0) == data.min()
    assert td.quantile(1.0) == data.max()


def test_tdigest_serialization():
    td = TDigest(compression=100)
    td.update_batch(np.random.default_rng(6).normal(size=20_000))
    td2 = from_bytes(td.to_bytes())
    assert td2.n == td.n
    assert td2.quantile(0.5) == td.quantile(0.5)
    assert td2.to_bytes() == td.to_bytes()


def test_quantile_sketch_centroid_budget():
    # t-digest memory stays bounded: centroids ~ delta after many batches
    td = TDigest(compression=100)
    for _ in range(50):
        td.update_batch(np.random.default_rng(7).uniform(size=10_000))
    td._flush()
    assert len(td.means) <= 2 * 100
    # KLL total retained items bounded by sum of level capacities
    sk = KLL(k=200)
    for _ in range(50):
        sk.update_batch(np.random.default_rng(8).uniform(size=10_000))
    assert sk._size() <= sk._total_cap() + 200
