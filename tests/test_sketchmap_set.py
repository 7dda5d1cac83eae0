"""SketchMapSet laws: Map[K, Set[V]] cells with Eventually-style
exact-set -> HLL-bank promotion (reference SketchMap.scala:40-240
generic V = Set under union + Eventually.scala:16-60)."""

from __future__ import annotations

import numpy as np
import pytest

from algebird_spark.sketches import SketchMapSet, from_bytes
from algebird_spark.sketches.base import IncompatibleSketchError


def _pairs(rng, n_keys, vals_per_key, n_rows):
    keys = rng.integers(0, n_keys, size=n_rows).astype(np.int64)
    vals = (keys * 1000 + rng.integers(0, vals_per_key, size=n_rows)) \
        .astype(np.int64)
    return keys, vals


def test_exact_recovery_small_sets():
    rng = np.random.default_rng(1)
    keys, vals = _pairs(rng, 40, 12, 5000)
    sk = SketchMapSet(eps=0.02, delta=0.01, max_exact=512)
    sk.update_batch(keys, vals)
    uniq = np.unique(keys)
    truth = {k: sorted(set(vals[keys == k].tolist())) for k in uniq.tolist()}
    got_counts = sk.values(uniq)
    got_sets = sk.value_sets(uniq)
    for k, cnt, s in zip(uniq.tolist(), got_counts.tolist(), got_sets):
        assert cnt == len(truth[k]), k        # min over rows is exact here
        assert s == truth[k], k               # intersection recovers the set


def test_promotion_keeps_counts_within_hll_error():
    rng = np.random.default_rng(2)
    # one hot key with a big set forces its cells past max_exact
    keys = np.concatenate([np.zeros(20000, dtype=np.int64),
                           rng.integers(1, 30, size=2000)]).astype(np.int64)
    vals = np.concatenate([rng.integers(0, 5000, size=20000),
                           rng.integers(10**6, 10**6 + 10, size=2000)]) \
        .astype(np.int64)
    sk = SketchMapSet(eps=0.02, delta=0.01, max_exact=64, p=12)
    sk.update_batch(keys, vals)
    assert sk.present()["n_promoted_cells"] > 0
    exact0 = len(set(vals[keys == 0].tolist()))
    est0 = float(sk.values(np.array([0]))[0])
    # lower side: cells contain key 0's own values; upper side: CMS
    # collisions only ADD. 3.5 sigma of the p=12 HLL error.
    err = 3.5 * 1.04 / np.sqrt(1 << 12)
    assert est0 >= exact0 * (1 - err)
    assert sk.value_sets(np.array([0]))[0] is None  # every row promoted


def test_merge_orders_byte_equal_and_idempotent():
    rng = np.random.default_rng(3)
    keys, vals = _pairs(rng, 25, 40, 12000)
    parts = []
    for lo in range(0, len(keys), 3000):
        p = SketchMapSet(eps=0.05, delta=0.05, max_exact=16, p=8)
        p.update_batch(keys[lo:lo + 3000], vals[lo:lo + 3000])
        parts.append(p.to_bytes())

    def fold(order):
        acc = from_bytes(parts[order[0]])
        for i in order[1:]:
            acc.merge_in_place(from_bytes(parts[i]))
        return acc.to_bytes()

    a = fold([0, 1, 2, 3])
    b = fold([3, 1, 0, 2])
    c = fold([2, 3, 0, 1])
    assert a == b == c
    # idempotent: replaying a part changes nothing (register max and
    # set union are both idempotent)
    acc = from_bytes(a)
    acc.merge_in_place(from_bytes(parts[1]))
    acc.n_pairs -= from_bytes(parts[1]).n_pairs  # counter is additive
    assert acc.to_bytes() == a


def test_merge_equals_single_build():
    rng = np.random.default_rng(4)
    keys, vals = _pairs(rng, 30, 30, 9000)
    whole = SketchMapSet(max_exact=24, p=9)
    whole.update_batch(keys, vals)
    half = SketchMapSet(max_exact=24, p=9)
    half.update_batch(keys[:4500], vals[:4500])
    other = SketchMapSet(max_exact=24, p=9)
    other.update_batch(keys[4500:], vals[4500:])
    half.merge_in_place(other)
    assert half.to_bytes() == whole.to_bytes()


def test_string_values_canonicalize():
    sk = SketchMapSet(max_exact=32)
    keys = np.array([1, 1, 2, 2, 1], dtype=np.int64)
    vals = np.array(["a", "b", "a", "a", "a"], dtype=object)
    sk.update_batch(keys, vals)
    counts = sk.values(np.array([1, 2, 3]))
    assert counts.tolist() == [2.0, 1.0, 0.0]
    sets = sk.value_sets(np.array([1, 2]))
    assert len(sets[0]) == 2 and len(sets[1]) == 1
    assert set(sets[1]) < set(sets[0])  # 'a' canonical hash is shared


def test_incompatible_merge_raises():
    a = SketchMapSet(max_exact=16)
    b = SketchMapSet(max_exact=32)
    with pytest.raises(IncompatibleSketchError):
        a.merge_in_place(b)


def test_roundtrip_and_decode_fuzz():
    rng = np.random.default_rng(5)
    keys, vals = _pairs(rng, 10, 60, 4000)
    sk = SketchMapSet(max_exact=20, p=8)
    sk.update_batch(keys, vals)
    blob = sk.to_bytes()
    back = from_bytes(blob)
    assert back.to_bytes() == blob
    uniq = np.unique(keys)
    assert back.values(uniq).tolist() == sk.values(uniq).tolist()
    # truncated / corrupted payloads must fail loudly, never decode
    for cut in (len(blob) - 1, len(blob) - 17, len(blob) // 2):
        with pytest.raises(Exception):
            from_bytes(blob[:cut])


def test_misaligned_and_bad_params():
    sk = SketchMapSet()
    with pytest.raises(ValueError):
        sk.update_batch(np.array([1, 2]), np.array([1]))
    with pytest.raises(ValueError):
        SketchMapSet(p=3)
    with pytest.raises(ValueError):
        SketchMapSet(max_exact=0)
