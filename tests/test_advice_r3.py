"""Regression tests for the round-2 ADVICE findings (fixed round 3):

1. Incremental checkpoint resume was not crash-idempotent: a driver
   dying between the delta-state append and the manifest update would
   double-count the delta on retry.
2. CMS / MinHash hash families changed without a version bump, so old
   persisted states decoded cleanly and returned silently wrong
   estimates (now: hash_family param tag + envelope VERSION=2).
3. Integer murmur dispatch was dtype-unstable: an int32 array hashed
   through the 4-byte kernel while int64 used the 8-byte kernel, so a
   Bloom filter built from int32 and probed with int64 produced false
   negatives.
4. _factorize_rows' mixed-radix combine could overflow int64 with many
   high-cardinality key columns, aliasing distinct key tuples.
5. near_dup operators leaked persisted blocks across calls and
   near_dup_pairs_simhash ran a full df.count() just to size banding.
"""

import json
import os
import shutil

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Row

from algebird_spark.agg import STATE_COL, _factorize_rows
from algebird_spark.functions.hashing import murmur128_any
from algebird_spark.sketches import CMS, HLL, from_bytes
from algebird_spark.sketches.bloom import BloomFilter
from algebird_spark.sketches.minhash import MinHash
from algebird_spark.sources.checkpoint import MANIFEST, build_or_resume


# ---------------------------------------------------------------------------
# 1. checkpoint crash-idempotency
# ---------------------------------------------------------------------------

def test_incremental_retry_after_crash_does_not_double_count(spark, tmp_path):
    """Simulate a driver crash between the delta-state write and the
    manifest commit: the staging dir exists but the manifest still
    points at the pre-append state. A retried build must converge to
    the same estimates as a clean incremental run (no double-counted
    delta rows)."""
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    spark.createDataFrame([Row(k="a", v=i) for i in range(400)]) \
        .coalesce(1).write.parquet(src)
    build_or_resume(spark, spark.read.parquet(src), ["k"], "v",
                    lambda: HLL(p=12), ck)
    man_before = open(os.path.join(ck, MANIFEST)).read()

    spark.createDataFrame([Row(k="a", v=400 + i) for i in range(400)]) \
        .coalesce(1).write.mode("append").parquet(src)
    df2 = spark.read.parquet(src)

    # first incremental attempt... then "crash" before the manifest
    # commit by restoring the pre-append manifest (staging dir stays)
    build_or_resume(spark, df2, ["k"], "v", lambda: HLL(p=12), ck)
    inc_dirs = [d for d in os.listdir(ck) if d.startswith("states_inc_")]
    assert len(inc_dirs) == 1  # delta landed in staging, not states/
    with open(os.path.join(ck, MANIFEST), "w") as f:
        f.write(man_before)

    # retry: must re-derive the SAME staging dir and overwrite it
    s = build_or_resume(spark, df2, ["k"], "v", lambda: HLL(p=12), ck)
    est = {r[0]: from_bytes(bytes(r[STATE_COL])).estimate()
           for r in s.collect()}
    assert [d for d in os.listdir(ck)
            if d.startswith("states_inc_")] == inc_dirs
    manifest = json.load(open(os.path.join(ck, MANIFEST)))
    assert manifest["state_dirs"] == ["states"] + inc_dirs
    # 800 distinct values; double-counting cannot inflate an HLL, but
    # the metrics would show 1200 processed values on a double append
    assert manifest["metrics"]["values_processed"] == 800
    full = build_or_resume(spark, df2, ["k"], "v", lambda: HLL(p=12),
                           str(tmp_path / "ck_full"))
    est_full = {r[0]: from_bytes(bytes(r[STATE_COL])).estimate()
                for r in full.collect()}
    assert est == est_full


def test_full_rebuild_drops_orphan_incremental_dirs(spark, tmp_path):
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    spark.createDataFrame([Row(k="a", v=i) for i in range(100)]) \
        .coalesce(1).write.parquet(src)
    build_or_resume(spark, spark.read.parquet(src), ["k"], "v",
                    lambda: HLL(p=12), ck)
    spark.createDataFrame([Row(k="a", v=100 + i) for i in range(100)]) \
        .coalesce(1).write.mode("append").parquet(src)
    build_or_resume(spark, spark.read.parquet(src), ["k"], "v",
                    lambda: HLL(p=12), ck)
    assert any(d.startswith("states_inc_") for d in os.listdir(ck))
    # rewrite -> full rebuild -> staging dirs must be gone
    spark.createDataFrame([Row(k="a", v=i) for i in range(50)]) \
        .coalesce(1).write.mode("overwrite").parquet(src)
    build_or_resume(spark, spark.read.parquet(src), ["k"], "v",
                    lambda: HLL(p=12), ck)
    assert not any(d.startswith("states_inc_") for d in os.listdir(ck))
    manifest = json.load(open(os.path.join(ck, MANIFEST)))
    assert manifest["state_dirs"] == ["states"]


def test_snapshot_id_fingerprint(spark, tmp_path):
    """Iceberg/Delta-style table identity: a caller-supplied snapshot
    id replaces the file walk + count scan entirely; an unchanged id
    serves the checkpoint, a new id rebuilds."""
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    spark.createDataFrame([Row(k="a", v=i) for i in range(300)]) \
        .coalesce(1).write.parquet(src)
    df = spark.read.parquet(src)
    s1 = build_or_resume(spark, df, ["k"], "v", lambda: HLL(p=12), ck,
                         snapshot_id=1001)
    manifest = json.load(open(os.path.join(ck, MANIFEST)))
    assert manifest["input_fingerprint"] == {
        "schema": df.schema.simpleString(), "snapshot_id": "1001"}

    # same snapshot id -> served from checkpoint (manifest untouched)
    mtime = os.path.getmtime(os.path.join(ck, MANIFEST))
    s2 = build_or_resume(spark, df, ["k"], "v", lambda: HLL(p=12), ck,
                         snapshot_id=1001)
    assert os.path.getmtime(os.path.join(ck, MANIFEST)) == mtime
    r1 = {r[0]: from_bytes(bytes(r[STATE_COL])).estimate()
          for r in s1.collect()}
    r2 = {r[0]: from_bytes(bytes(r[STATE_COL])).estimate()
          for r in s2.collect()}
    assert r1 == r2

    # new snapshot id -> rebuild
    build_or_resume(spark, df, ["k"], "v", lambda: HLL(p=12), ck,
                    snapshot_id=1002)
    manifest = json.load(open(os.path.join(ck, MANIFEST)))
    assert manifest["input_fingerprint"]["snapshot_id"] == "1002"
    assert manifest["stage"] == "partition_states"


# ---------------------------------------------------------------------------
# 2. hash-family version tags
# ---------------------------------------------------------------------------

def test_hash_family_tagged_in_params():
    assert CMS(eps=0.01, delta=0.01)._params()["hash_family"] \
        == "multilinear64_v2"
    assert MinHash(num_lanes=16)._params()["hash_family"] == "mersenne61_v2"


def test_v1_envelope_rejected():
    sk = HLL(p=10)
    sk.update_batch(np.arange(100))
    data = bytearray(sk.to_bytes())
    assert data[4] == 2  # VERSION
    data[4] = 1  # forge a pre-round-3 state
    with pytest.raises(ValueError, match="version"):
        from_bytes(bytes(data))


def test_merge_check_rejects_foreign_hash_family():
    a = CMS(eps=0.01, delta=0.01)
    b = CMS(eps=0.01, delta=0.01)
    b_params = b._params  # simulate a state persisted under the old family
    b._params = lambda: {**b_params(), "hash_family": "fold31_v1"}
    with pytest.raises(ValueError):
        a.merge_in_place(b)


# ---------------------------------------------------------------------------
# 3. integer dtype-stable hashing
# ---------------------------------------------------------------------------

def test_murmur_any_int_dtype_stable():
    vals32 = np.array([0, 1, -5, 2**31 - 1, -2**31], dtype=np.int64)
    h64_1, h64_2 = murmur128_any(vals32, 7)
    g1, g2 = murmur128_any(vals32.astype(np.int32), 7)
    np.testing.assert_array_equal(h64_1, g1)
    np.testing.assert_array_equal(h64_2, g2)
    vals16 = np.array([0, 1, -5, 32767, -32768], dtype=np.int64)
    a1, a2 = murmur128_any(vals16, 7)
    b1, b2 = murmur128_any(vals16.astype(np.int16), 7)
    np.testing.assert_array_equal(a1, b1)
    np.testing.assert_array_equal(a2, b2)
    u1, u2 = murmur128_any(np.array([3, 4000000000], dtype=np.uint32), 7)
    s1, s2 = murmur128_any(np.array([3, 4000000000], dtype=np.int64), 7)
    np.testing.assert_array_equal(u1, s1)
    np.testing.assert_array_equal(u2, s2)


def test_bloom_no_false_negative_across_int_dtypes():
    keys32 = np.arange(0, 5000, dtype=np.int32)
    bf = BloomFilter(num_entries=10000, fp_prob=0.01)
    bf.update_batch(keys32)
    hits = bf.contains_batch(keys32.astype(np.int64))
    assert bool(hits.all()), "int64 probe of int32-built filter missed"
    hits16 = bf.contains_batch(np.arange(0, 100, dtype=np.int16))
    assert bool(hits16.all())


def test_hll_estimate_dtype_stable():
    a = HLL(p=12)
    a.update_batch(np.arange(10000, dtype=np.int32))
    b = HLL(p=12)
    b.update_batch(np.arange(10000, dtype=np.int64))
    assert a.estimate() == b.estimate()
    assert bytes(a.to_bytes()) == bytes(b.to_bytes())


# ---------------------------------------------------------------------------
# 4. mixed-radix overflow guard
# ---------------------------------------------------------------------------

def test_factorize_rows_high_cardinality_no_aliasing():
    """6 key columns x 2^16 uniques each: the radix product (2^96)
    would wrap int64; the MultiIndex fallback must keep every distinct
    tuple distinct."""
    n = 65536
    rng = np.random.default_rng(42)
    kf = pd.DataFrame({
        f"k{i}": rng.permutation(n) for i in range(6)})
    keys = [f"k{i}" for i in range(6)]
    codes, uniques = _factorize_rows(kf, keys)
    # every row is a distinct tuple (permutation columns) -> n groups
    assert len(uniques) == n
    assert len(np.unique(codes)) == n
    # spot-check the code -> tuple mapping round-trips
    for i in (0, 1, 12345, n - 1):
        assert uniques[codes[i]] == tuple(kf.iloc[i][k] for k in keys)


def test_factorize_rows_small_path_unchanged():
    kf = pd.DataFrame({"a": [1, 1, 2, None], "b": ["x", "x", "y", "z"]})
    codes, uniques = _factorize_rows(kf, ["a", "b"])
    assert len(uniques) == 3
    assert codes[0] == codes[1] != codes[2]


# ---------------------------------------------------------------------------
# 5. operator cache lifetime + no eager actions
# ---------------------------------------------------------------------------

def test_simhash_operator_triggers_no_jobs_before_consumption(spark):
    """No Spark action may run inside an operator constructor path
    (the old code ran df.count() to size banding — a full extra scan
    of a 100 TB input)."""
    from algebird_spark.operators.dedup import near_dup_pairs_simhash
    df = spark.createDataFrame(
        [Row(doc_id=i, text=f"some document text number {i} with words")
         for i in range(50)])
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup())
    # above the r8 broadcast gate: the at-scale plan must stay fully
    # lazy (below the gate the broadcast-kernel path collects the
    # 16 B/doc fingerprint table at call time by design — bounded)
    out = near_dup_pairs_simhash(df, approx_rows=500_000)
    after = set(tracker.getJobIdsForGroup())
    assert before == after, "operator ran a Spark job before consumption"
    assert out.count() >= 0  # and it still executes fine


def _mk_corpus(spark, tag, n=30):
    # NB: inputs must differ per call — Spark's cache manager keys by
    # logical plan, so re-persisting an identical plan would make the
    # first handle report as cached again.
    return spark.createDataFrame(
        [Row(doc_id=i, text=f"{tag} corpus {i} alpha beta gamma")
         for i in range(n)])


def test_interleaved_invocations_keep_both_caches(spark):
    """VERDICT r4 wrong #3 retired: the registry keeps the newest
    KEEP_GENERATIONS (=2) invocations per operator, so two interleaved
    invocations of one operator both stay cached; a third evicts the
    oldest (bounded block-manager storage in bench loops)."""
    from algebird_spark.operators import dedup as d
    d.release_caches()
    # approx_rows above the r8 broadcast gate: the cache registry under
    # test only exists on the at-scale JVM path
    outs = [d.near_dup_pairs_simhash(_mk_corpus(spark, t),
                                     approx_rows=500_000)
            for t in ("one", "two")]
    for o in outs:  # interleaved: both lazily built, then materialized
        o.count()
    gens = sorted(d._OPERATOR_CACHES["simhash"])
    assert len(gens) == 2
    cached = [df for g in gens for df in d._OPERATOR_CACHES["simhash"][g]]
    assert all(c.storageLevel.useMemory for c in cached)
    # a third invocation evicts only the OLDEST generation
    d.near_dup_pairs_simhash(_mk_corpus(spark, "three"),
                             approx_rows=500_000).count()
    assert len(d._OPERATOR_CACHES["simhash"]) == 2
    assert gens[0] not in d._OPERATOR_CACHES["simhash"]
    assert not cached[0].storageLevel.useMemory  # evicted
    assert cached[1].storageLevel.useMemory      # second invocation kept
    d.release_caches()
    assert "simhash" not in d._OPERATOR_CACHES


def test_cache_handle_releases_only_its_invocation(spark):
    from algebird_spark.operators import dedup as d
    d.release_caches()
    a = d.near_dup_pairs_simhash(_mk_corpus(spark, "ha"),
                                 approx_rows=500_000)
    b = d.near_dup_pairs_simhash(_mk_corpus(spark, "hb"),
                                 approx_rows=500_000)
    a.count(), b.count()
    ga, gb = a._algebird_cache.gen, b._algebird_cache.gen
    assert ga != gb
    a._algebird_cache.release()
    slots = d._OPERATOR_CACHES["simhash"]
    assert ga not in slots and gb in slots
    assert all(df.storageLevel.useMemory for df in slots[gb])
    b._algebird_cache.release()
    assert "simhash" not in d._OPERATOR_CACHES
    # releasing twice is a no-op
    a._algebird_cache.release()


def test_two_successive_incremental_appends(spark, tmp_path):
    """Each append-only growth adds its own staging dir; the manifest
    accumulates state_dirs and the merged result equals a full rebuild
    after BOTH appends."""
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    spark.createDataFrame([Row(k="a", v=i) for i in range(300)]) \
        .coalesce(1).write.parquet(src)
    build_or_resume(spark, spark.read.parquet(src), ["k"], "v",
                    lambda: HLL(p=12), ck)
    for r, lo in ((1, 300), (2, 600)):
        spark.createDataFrame([Row(k="a", v=lo + i) for i in range(300)]) \
            .coalesce(1).write.mode("append").parquet(src)
        build_or_resume(spark, spark.read.parquet(src), ["k"], "v",
                        lambda: HLL(p=12), ck)
        manifest = json.load(open(os.path.join(ck, MANIFEST)))
        assert manifest["stage"].startswith("incremental_append")
        assert len(manifest["state_dirs"]) == 1 + r
    s = build_or_resume(spark, spark.read.parquet(src), ["k"], "v",
                        lambda: HLL(p=12), ck)  # serve path, 3 dirs
    est = {r[0]: from_bytes(bytes(r[STATE_COL])).estimate()
           for r in s.collect()}
    full = build_or_resume(spark, spark.read.parquet(src), ["k"], "v",
                           lambda: HLL(p=12), str(tmp_path / "ck_full"))
    est_full = {r[0]: from_bytes(bytes(r[STATE_COL])).estimate()
                for r in full.collect()}
    assert est == est_full
    manifest = json.load(open(os.path.join(ck, MANIFEST)))
    assert manifest["metrics"]["values_processed"] == 900
