"""Bloom filter tests: zero false negatives, measured FPP <= 1.1x target,
merge = bitwise OR monoid, size estimate, serialization
(modeled on algebird-test .../BloomFilterTest.scala designs)."""

import numpy as np
import pytest

from algebird_spark.sketches import BloomFilter, from_bytes


@pytest.mark.parametrize("n,fpp", [(1_000, 0.01), (100_000, 0.01), (10_000, 0.001)])
def test_no_false_negatives_and_fpp(n, fpp):
    rng = np.random.default_rng(n)
    present = rng.choice(np.arange(10_000_000, dtype=np.int64), size=n, replace=False)
    bf = BloomFilter(num_entries=n, fp_prob=fpp)
    for chunk in np.array_split(present, 4):
        bf.update_batch(chunk)
    assert bf.contains_batch(present).all(), "false negative!"
    absent = np.arange(20_000_000, 20_000_000 + 50_000, dtype=np.int64)
    fp_rate = float(bf.contains_batch(absent).mean())
    assert fp_rate <= 1.5 * fpp + 3.0 / 50_000, f"fpp {fp_rate} vs target {fpp}"


def test_merge_is_or_monoid():
    a_vals = np.arange(0, 500, dtype=np.int64)
    b_vals = np.arange(400, 900, dtype=np.int64)
    a = BloomFilter(2_000, 0.01)
    b = BloomFilter(2_000, 0.01)
    a.update_batch(a_vals)
    b.update_batch(b_vals)
    ab = a + b
    ba = b + a
    assert ab.to_bytes() == ba.to_bytes()
    assert ab.contains_batch(np.arange(0, 900, dtype=np.int64)).all()
    both = BloomFilter(2_000, 0.01)
    both.update_batch(np.concatenate([a_vals, b_vals]))
    assert np.array_equal(ab.bits, both.bits)
    zero = BloomFilter(2_000, 0.01)
    assert (a + zero).to_bytes() == a.to_bytes()


def test_size_estimate():
    n = 5_000
    bf = BloomFilter(50_000, 0.01)
    bf.update_batch(np.arange(n, dtype=np.int64))
    est = bf.size_estimate()
    assert abs(est.estimate - n) / n < 0.1
    assert est.low <= n <= est.high


def test_hamming_distance():
    a = BloomFilter(1_000, 0.01)
    b = BloomFilter(1_000, 0.01)
    a.update_batch(np.array([1], dtype=np.int64))
    b.update_batch(np.array([1], dtype=np.int64))
    assert a.hamming_distance(b) == 0
    b.update_batch(np.array([2], dtype=np.int64))
    assert a.hamming_distance(b) > 0


def test_string_keys():
    bf = BloomFilter(100, 0.01)
    bf.update_batch(np.array(["alpha", "beta"], dtype=object))
    got = bf.contains_batch(np.array(["alpha", "beta", "gamma"], dtype=object))
    assert got[0] and got[1]


def test_serialization_roundtrip():
    bf = BloomFilter(10_000, 0.01)
    bf.update_batch(np.arange(3_000, dtype=np.int64))
    bf2 = from_bytes(bf.to_bytes())
    assert np.array_equal(bf.bits, bf2.bits)
    assert bf2.to_bytes() == bf.to_bytes()
