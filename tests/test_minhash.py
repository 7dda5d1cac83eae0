"""MinHash tests: Jaccard estimate accuracy, min-monoid laws, LSH buckets
(modeled on algebird-core .../MinHasher.scala semantics)."""

import numpy as np

from algebird_spark.sketches import MinHash, from_bytes, pick_bands_rows


def sig_of(values, lanes=256):
    mh = MinHash(num_lanes=lanes)
    mh.update_batch(np.asarray(values, dtype=np.int64))
    return mh


def test_jaccard_estimate():
    a = np.arange(0, 1000)
    b = np.arange(500, 1500)  # jaccard = 500/1500 = 1/3
    sa, sb = sig_of(a), sig_of(b)
    est = sa.similarity(sb)
    assert abs(est - 1 / 3) < 0.12


def test_monoid_min_merge():
    a, b = sig_of(np.arange(100)), sig_of(np.arange(100, 200))
    union_direct = sig_of(np.arange(200))
    ab = a + b
    assert ab.to_bytes() == (b + a).to_bytes()
    assert np.array_equal(ab.sig, union_direct.sig)
    identical = sig_of(np.arange(100))
    assert a.similarity(identical) == 1.0


def test_lsh_buckets_match_for_identical():
    a, b = sig_of(np.arange(500)), sig_of(np.arange(500))
    bands, rows = pick_bands_rows(256, 0.8)
    assert a.lsh_buckets(bands) == b.lsh_buckets(bands)


def test_serialization():
    mh = sig_of(np.arange(300))
    mh2 = from_bytes(mh.to_bytes())
    assert np.array_equal(mh.sig, mh2.sig)
