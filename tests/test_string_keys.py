"""String/bytes key support across the int-keyed sketches — the
CMSHasher[K] surface (algebird-core CMSHasher.scala:19-169; monoid laws
for 7 key types at test/CountMinSketchTest.scala:16-147). Key types
exercised here: int32, int64, uint64, float64, str, bytes, bool — plus
the vectorized variable-length murmur kernel itself."""

import numpy as np
import pyarrow as pa
import pytest

from algebird_spark.functions.hashing import (murmur3_x64_128,
                                              murmur128_any, murmur64_any,
                                              prepare_keys)
from algebird_spark.sketches import CMS, HLL, BloomFilter, SketchMap, from_bytes
from algebird_spark.sketches.spacesaver import SpaceSaver

KEY_BATCHES = {
    "int32": np.arange(-500, 500, dtype=np.int32),
    "int64": np.arange(-500, 500, dtype=np.int64) * 2**33,
    "uint64": np.arange(1000, dtype=np.uint64) + np.uint64(2**63),
    "float64": np.linspace(-5, 5, 1000),
    "str": np.array([f"key_{i}_{'x' * (i % 37)}" for i in range(1000)],
                    dtype=object),
    "bytes": np.array([f"b{i}".encode() * (1 + i % 5) for i in range(1000)],
                      dtype=object),
    "bool": np.tile(np.array([True, False]), 500),
}


def test_murmur128_bytes_bit_exact_property():
    rng = np.random.default_rng(17)
    strs = [bytes(rng.integers(0, 256, size=int(L)).tolist())
            for L in rng.integers(0, 120, size=400)]
    h1, h2 = murmur128_any(pa.array(strs, type=pa.binary()), 12345678)
    for i, s in enumerate(strs):
        assert (int(h1[i]), int(h2[i])) == murmur3_x64_128(s, 12345678)


def test_murmur64_any_strings_match_scalar():
    texts = np.array(["", "a", "hello world", "naïve café 東京", "x" * 77,
                      "sixteen bytes!!!", "seventeen bytes!!"], dtype=object)
    got = murmur64_any(texts, 99)
    for i, t in enumerate(texts):
        assert int(got[i]) == murmur3_x64_128(t.encode("utf-8"), 99)[0]


@pytest.mark.parametrize("kind", list(KEY_BATCHES))
def test_cms_laws_all_key_types(kind):
    """Monoid laws + point-query bound for every key type
    (CountMinSketchTest.scala:16-147 analog)."""
    keys = KEY_BATCHES[kind]
    reps = np.tile(keys, 3)
    a, b, c = CMS(eps=0.005, delta=1e-4), CMS(eps=0.005, delta=1e-4), \
        CMS(eps=0.005, delta=1e-4)
    thirds = np.array_split(reps, 3)
    a.update_batch(thirds[0])
    b.update_batch(thirds[1])
    c.update_batch(thirds[2])
    # associativity + commutativity via bytes round-trip
    ab_c = from_bytes(a.to_bytes()).merge_in_place(from_bytes(b.to_bytes())) \
        .merge_in_place(from_bytes(c.to_bytes()))
    c_ba = from_bytes(c.to_bytes()).merge_in_place(from_bytes(b.to_bytes())) \
        .merge_in_place(from_bytes(a.to_bytes()))
    assert ab_c.total == c_ba.total == len(reps)
    uniq = keys if kind != "bool" else np.array([True, False])
    ea = ab_c.frequencies(uniq)
    eb = c_ba.frequencies(uniq)
    assert (ea == eb).all()
    # never under; over <= eps*N
    true_counts = 3 * (len(reps) // 3 // len(uniq)) if kind == "bool" else 3
    assert (ea >= true_counts).all()
    assert (ea <= true_counts + ab_c.eps * ab_c.total).all()


def test_cms_string_frequency_scalar_api():
    sk = CMS(eps=0.01, delta=1e-4)
    sk.update_batch(np.array(["alpha"] * 50 + ["beta"] * 7, dtype=object))
    assert sk.frequency("alpha").estimate >= 50
    assert sk.frequency("beta").estimate >= 7
    assert sk.frequency("beta").estimate <= 7 + sk.eps * sk.total


def test_hll_string_keys_accuracy():
    docs = np.array([f"doc_{i % 700}" for i in range(5000)], dtype=object)
    h = HLL(p=12)
    h.update_batch(docs)
    assert abs(h.estimate() - 700) / 700 <= 3.5 * 1.04 / np.sqrt(2**12)


def test_bloom_string_keys_no_false_negatives():
    keys = np.array([f"url_{i}/path?q={i}" for i in range(2000)], dtype=object)
    bf = BloomFilter(num_entries=2000, fp_prob=0.01)
    for chunk in np.array_split(keys, 4):
        bf.update_batch(chunk)
    assert bf.contains_batch(keys).all()
    absent = np.array([f"absent_{i}" for i in range(20000)], dtype=object)
    assert bf.contains_batch(absent).mean() <= 0.02 + 1e-3


def test_spacesaver_string_labels_roundtrip():
    rng = np.random.default_rng(5)
    # zipf-ish: "ua_0" dominates
    items = np.array([f"ua_{min(int(z), 30)}" for z in rng.zipf(1.5, 4000)],
                     dtype=object)
    a, b = SpaceSaver(capacity=64), SpaceSaver(capacity=64)
    a.update_batch(items[:2000])
    b.update_batch(items[2000:])
    merged = from_bytes(a.to_bytes())
    merged.merge_in_place(from_bytes(b.to_bytes()))
    top = merged.top_k(3)
    labels = [t[0] for t in top]
    assert labels[0] == "ua_1"
    assert all(isinstance(x, str) for x in labels)
    exact_top = int((items == "ua_1").sum())
    assert top[0][1] >= exact_top  # count upper bound holds


def test_sketchmap_string_keys_sum():
    sm = SketchMap(eps=0.005, delta=1e-4, heavy_hitters_count=5)
    keys = np.array(["s3://a", "s3://b", "s3://a"], dtype=object)
    sm.update_batch(keys, np.array([1.5, 2.0, 3.5]))
    got = sm.values(np.array(["s3://a", "s3://b"], dtype=object))
    assert got[0] >= 5.0 - 1e-9 and got[1] >= 2.0 - 1e-9
    assert got[0] <= 5.0 + sm.eps * sm.total + 1e-9


def test_prepare_keys_int_passthrough_and_hash_consistency():
    ints = np.arange(10, dtype=np.int64)
    assert prepare_keys(ints) is ints
    s1 = prepare_keys(np.array(["a", "b"], dtype=object))
    s2 = prepare_keys(np.array(["a", "b"], dtype=object))
    assert s1.tolist() == s2.tolist()
    assert s1.dtype == np.int64


def test_spacesaver_label_state_byte_equality():
    """Serialization canonicalization extends to the label table: equal
    states built in different orders serialize byte-identically."""
    a, b = SpaceSaver(capacity=16), SpaceSaver(capacity=16)
    items1 = np.array(["x", "y", "z", "x"], dtype=object)
    items2 = np.array(["z", "x", "x", "y"], dtype=object)
    a.update_batch(items1)
    b.update_batch(items2)
    assert a.to_bytes() == b.to_bytes()
    rt = from_bytes(a.to_bytes())
    assert rt.to_bytes() == a.to_bytes()
    assert rt.top_k(3) == a.top_k(3)
