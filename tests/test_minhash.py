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


def test_kernel_band_buckets_match_signature_banding(spark):
    """add_minhash_bands must equal band_buckets_of_signature applied
    to add_minhash_signature's output — same kernel, same params —
    and identical/near-identical docs must share buckets exactly
    where their signature slices agree."""
    import numpy as np
    from algebird_spark.operators.dedup import (add_minhash_bands,
                                                add_minhash_signature,
                                                band_buckets_of_signature)
    rows = [(1, "the quick brown fox jumps over the lazy dog again"),
            (2, "the quick brown fox jumps over the lazy dog again"),
            (3, "a completely different document about spark engines"),
            (4, ""), (5, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = {r["doc_id"]: r["minhash"] for r in
           add_minhash_signature(df, "text").select("doc_id", "minhash")
           .collect()}
    bnd = {r["doc_id"]: r["mh_bands"] for r in
           add_minhash_bands(df, "text").select("doc_id", "mh_bands")
           .collect()}
    for i in (1, 2, 3):
        expect = band_buckets_of_signature(
            np.asarray([sig[i]], dtype=np.int64), 16)[0].tolist()
        assert bnd[i] == expect, i
    assert bnd[1] == bnd[2]                   # identical docs: all bands
    assert bnd[4] is None and bnd[5] is None  # zero-shingle docs: NULL
    # distinct docs must not share any band bucket by accident
    assert not set(bnd[1]) & set(bnd[3])


def test_candidate_pairs_from_bands_matches_signature_path(spark):
    """Band-kernel candidates == expression-banding candidates on the
    same corpus (both hash the same signature slices)."""
    from algebird_spark.operators.dedup import (add_minhash_bands,
                                                add_minhash_signature,
                                                lsh_candidate_pairs,
                                                lsh_candidate_pairs_from_bands)
    base = "w%d " * 40
    rows = [(i, (base % tuple(range(40))) + f"tail{i % 3}")
            for i in range(30)] + [(99, ""), (100, "solo doc here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = add_minhash_signature(df, "text")
    old = {(r["id_a"], r["id_b"]) for r in
           lsh_candidate_pairs(sig, "doc_id", "minhash", 16).collect()}
    bnd = add_minhash_bands(df, "text")
    new = {(r["id_a"], r["id_b"]) for r in
           lsh_candidate_pairs_from_bands(bnd, "doc_id", "mh_bands")
           .collect()}
    assert new == old


def test_candidate_pairs_max_bucket_guard(spark):
    """ADVICE r5: max_bucket drops pathological buckets BEFORE
    collect_list materializes them; small buckets are unaffected."""
    from algebird_spark.operators.dedup import (
        add_minhash_bands, lsh_candidate_pairs_from_bands)
    # 40 identical boilerplate docs (one giant bucket per band) + one
    # genuinely similar pair
    boiler = "the same boilerplate text repeated " * 10
    pairtext = " ".join(f"u{i}" for i in range(60))
    rows = ([(i, boiler) for i in range(40)]
            + [(100, pairtext), (101, pairtext + " x")])
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bnd = add_minhash_bands(df, "text")
    unguarded = {(r["id_a"], r["id_b"]) for r in
                 lsh_candidate_pairs_from_bands(bnd).collect()}
    guarded = {(r["id_a"], r["id_b"]) for r in
               lsh_candidate_pairs_from_bands(bnd, max_bucket=10)
               .collect()}
    assert (100, 101) in unguarded and (100, 101) in guarded
    assert (0, 1) in unguarded          # boilerplate pairs exist...
    assert (0, 1) not in guarded        # ...and the guard drops them
    assert guarded < unguarded
