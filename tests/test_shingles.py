"""Shingle-hash kernel: parity with a naive per-doc reference, the
short-doc fallback, contamination (full_only) semantics, and
hash-space-independent Jaccard equality."""

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from algebird_spark.operators.dedup import (_shingle_hashes_batch,
                                            shingle_hashes_udf)


def _naive_shingles(text, n):
    toks = (text or "").lower().split()
    if not toks:
        return []
    if len(toks) < n:
        return [tuple(toks)]
    return [tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)]


def test_kernel_counts_and_distinctness_match_naive():
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "a b a b a b a b",            # heavy duplicate shingles
        "one two",                     # shorter than n -> one shingle
        "single",
        "",
        None,
        "x " * 500,                    # one distinct shingle, many copies
    ]
    n = 3
    hv, starts, lens = _shingle_hashes_batch(texts, n, 99)
    assert len(starts) == len(texts) + 1
    for i, t in enumerate(texts):
        naive = _naive_shingles(t, n)
        seg = hv[starts[i]:starts[i + 1]]
        assert len(seg) == len(naive)
        # equal raw shingles must hash equal; distinct counts match
        assert len(np.unique(seg)) == len(set(naive)), (i, t)
    assert lens.tolist() == [len((t or "").split()) for t in texts]


def test_kernel_jaccard_equals_naive_jaccard():
    """Hashing is a bijection w.h.p., so hashed-set Jaccard == raw
    word-shingle Jaccard."""
    a = "alpha beta gamma delta epsilon zeta eta theta"
    b = "alpha beta gamma delta epsilon zeta eta iota"
    n = 3
    hv, starts, _ = _shingle_hashes_batch([a, b], n, 7)
    sa = set(hv[starts[0]:starts[1]].tolist())
    sb = set(hv[starts[1]:starts[2]].tolist())
    got = len(sa & sb) / len(sa | sb)
    na, nb = set(_naive_shingles(a, n)), set(_naive_shingles(b, n))
    want = len(na & nb) / len(na | nb)
    assert got == pytest.approx(want)


def test_udf_distinct_and_full_only(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
        Row(doc_id=2, text="short row"),          # < 8 tokens
        Row(doc_id=3, text=None),
        Row(doc_id=4, text="dup dup dup dup dup dup dup dup dup"),
    ])
    near = {r["doc_id"]: r["sh"] for r in df.select(
        "doc_id", shingle_hashes_udf(8)(F.col("text")).alias("sh")).collect()}
    assert len(near[1]) == 3          # 10 - 8 + 1
    assert len(near[2]) == 1          # short-doc fallback: one shingle
    assert near[3] == []              # null text -> no tokens
    assert len(near[4]) == 1          # 9 identical tokens -> 1 distinct 8-gram
    full = {r["doc_id"]: r["sh"] for r in df.select(
        "doc_id", shingle_hashes_udf(8, full_only=True)(F.col("text"))
        .alias("sh")).collect()}
    assert len(full[1]) == 3
    assert full[2] == [] and full[3] == []   # short rows emit nothing
    assert len(full[4]) == 1


def test_short_doc_clamp_does_not_collide_with_padded_repeat():
    """ADVICE r3 (medium): the short-doc clamp repeats the last token,
    so 'a b' and 'a b b' hashed identically at n=3 and jaccard_verify
    reported 1.0 for non-identical docs. The length seed must keep
    every clamp-padded prefix distinct from its real-repeat sibling."""
    n = 3
    texts = ["a b", "a b b", "a", "a a", "a a a", "a b b b"]
    hv, starts, _ = _shingle_hashes_batch(texts, n, 99)
    sets = [set(hv[starts[i]:starts[i + 1]].tolist())
            for i in range(len(texts))]
    # 'a b' (clamped to a,b,b) vs real 'a b b'
    assert sets[0] != sets[1]
    # 'a' (clamped to a,a,a) vs 'a a' (clamped) vs real 'a a a'
    assert sets[2] != sets[3] and sets[2] != sets[4] and sets[3] != sets[4]
    # full-length docs unaffected: 'a b b' still equals itself and
    # distinct docs stay distinct
    hv2, starts2, _ = _shingle_hashes_batch(["a b b"], n, 99)
    assert set(hv2[starts2[0]:starts2[1]].tolist()) == sets[1]
    assert sets[1] != sets[5]


def test_short_doc_identical_texts_still_collide():
    """The seed is a function of length only — identical short docs
    must still hash identically (that's what dedup needs)."""
    hv, starts, _ = _shingle_hashes_batch(["x y", "x y"], 3, 42)
    assert (set(hv[starts[0]:starts[1]].tolist())
            == set(hv[starts[1]:starts[2]].tolist()))


def _naive_jaccard_pairs(texts, n, threshold):
    """All-pairs exact word-shingle Jaccard >= threshold."""
    sets = {i: set(_naive_shingles(t, n)) for i, t in enumerate(texts)
            if _naive_shingles(t, n)}
    out = {}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
            if j >= threshold:
                out[(a, b)] = j
    return out


def test_ngram_near_dup_matches_naive_all_pairs(spark):
    """near_dup_pairs_ngram (inverted index, never all-pairs) returns
    the EXACT all-pairs Jaccard result: same pair set, same values."""
    from algebird_spark.operators.dedup import near_dup_pairs_ngram

    texts = [
        "the quick brown fox jumps over the lazy dog today",
        "the quick brown fox jumps over the lazy cat today",   # near-dup of 0
        "the quick brown fox jumps over the lazy dog today",   # exact dup of 0
        "completely different words in this particular document here",
        "one two",                                              # short doc
        "one two",                                              # short dup
        "",                                                     # no shingles
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    got = {(r.id_a, r.id_b): r.jaccard
           for r in near_dup_pairs_ngram(df, "doc_id", "text",
                                         shingle_n=3,
                                         threshold=0.3).collect()}
    want = _naive_jaccard_pairs(texts, 3, 0.3)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12), k
    assert got[(0, 2)] == 1.0          # exact dup
    assert got[(4, 5)] == 1.0          # short-doc exact dup
    assert 0.3 <= got[(0, 1)] < 1.0    # near-dup


def test_ngram_near_dup_max_df_only_lowers_jaccard(spark):
    """Stop-shingle pruning (max_df) is conservative: every surviving
    pair's jaccard is <= its exact value, and no pair appears that the
    exact run does not contain (given the same threshold filter is
    applied after)."""
    from algebird_spark.operators.dedup import near_dup_pairs_ngram

    texts = [
        "common boiler plate common boiler plate unique alpha one",
        "common boiler plate common boiler plate unique beta two",
        "common boiler plate common boiler plate unique gamma three",
        "totally unrelated text goes here with other words",
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    exact = {(r.id_a, r.id_b): r.jaccard
             for r in near_dup_pairs_ngram(df, "doc_id", "text",
                                           shingle_n=3,
                                           threshold=0.0).collect()}
    pruned = {(r.id_a, r.id_b): r.jaccard
              for r in near_dup_pairs_ngram(df, "doc_id", "text",
                                            shingle_n=3, threshold=0.0,
                                            max_df=2).collect()}
    assert set(pruned) <= set(exact)
    for k, v in pruned.items():
        assert v <= exact[k] + 1e-12, k


def test_ngram_near_dup_randomized_corpus_parity(spark):
    """Seeded random corpus over a 6-word vocabulary (maximal shingle
    sharing, many short docs) — inverted-index result must equal naive
    all-pairs exactly, including pairs exactly AT the threshold."""
    from algebird_spark.operators.dedup import near_dup_pairs_ngram

    rng = np.random.RandomState(20260817)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    texts = [" ".join(rng.choice(vocab, size=rng.randint(1, 12)))
             for _ in range(60)]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    got = {(r.id_a, r.id_b): r.jaccard
           for r in near_dup_pairs_ngram(df, "doc_id", "text",
                                         shingle_n=3,
                                         threshold=0.25).collect()}
    want = _naive_jaccard_pairs(texts, 3, 0.25)
    assert set(got) == set(want), (set(got) ^ set(want))
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12), k


def test_ngram_broadcast_path_matches_index_path(spark):
    """r8: the broadcast-index kernel (default below the size gate)
    emits exactly the explode+groupBy inverted index's pairs —
    including jaccard doubles — with and without max_df pruning."""
    from algebird_spark.operators.dedup import near_dup_pairs_ngram

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    for kw in ({}, {"max_df": 20, "threshold": 0.3}):
        new = sorted(map(tuple, near_dup_pairs_ngram(
            docs, "doc_id", "text", shingle_n=3, **kw).collect()))
        old = sorted(map(tuple, near_dup_pairs_ngram(
            docs, "doc_id", "text", shingle_n=3, broadcast_max_docs=0,
            **kw).collect()))
        assert new == old and len(new) > 0


def test_simhash_broadcast_path_matches_jvm_path(spark):
    """r8: the broadcast-kernel simhash path (taken below the gate when
    approx_rows is hinted) emits exactly the JVM banding plan's
    (id_a, id_b, hamming) rows."""
    from algebird_spark.operators.dedup import near_dup_pairs_simhash

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    new = sorted(map(tuple, near_dup_pairs_simhash(
        docs, approx_rows=5000).collect()))
    jvm4 = sorted(map(tuple, near_dup_pairs_simhash(
        docs, chunks=4).collect()))
    jvm8 = sorted(map(tuple, near_dup_pairs_simhash(
        docs, chunks=8).collect()))
    assert new == jvm4 == jvm8 and len(new) > 0
