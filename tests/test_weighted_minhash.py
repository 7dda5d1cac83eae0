"""ICWS weighted MinHash: estimator accuracy vs exact weighted
Jaccard, consistency, frequency sensitivity, Spark pipeline."""

import numpy as np

from pyspark.sql import functions as F

from algebird_spark.operators.weighted_minhash import (
    _doc_token_weights, add_weighted_minhash_signature, icws_signatures,
    near_dup_pairs_weighted, weighted_jaccard_exact)


def _exact_wj(ca: dict, cb: dict) -> float:
    keys = set(ca) | set(cb)
    num = sum(min(ca.get(k, 0), cb.get(k, 0)) for k in keys)
    den = sum(max(ca.get(k, 0), cb.get(k, 0)) for k in keys)
    return num / den


def _sig_pair(wa: dict, wb: dict, num_perm: int, seed: int = 7):
    keys = sorted(set(wa) | set(wb))
    kid = {k: np.uint64(hash(k) & (2**63 - 1)) for k in keys}
    rows = []
    for w in (wa, wb):
        uh = np.array([kid[k] for k in sorted(w)], dtype=np.uint64)
        ww = np.array([float(w[k]) for k in sorted(w)], dtype=np.float64)
        starts = np.array([0, len(uh)], dtype=np.int64)
        rows.append(icws_signatures(uh, ww, starts, num_perm, seed)[0])
    return rows


def test_identical_weighted_sets_collide_everywhere():
    w = {"a": 3, "b": 1, "c": 7}
    sa, sb = _sig_pair(w, dict(w), 64)
    assert np.array_equal(sa, sb)


def test_estimator_matches_weighted_jaccard():
    rng = np.random.default_rng(3)
    for trial in range(4):
        ka = {f"t{i}": int(rng.integers(1, 20))
              for i in rng.choice(50, size=30, replace=False)}
        kb = {f"t{i}": int(rng.integers(1, 20))
              for i in rng.choice(50, size=30, replace=False)}
        exact = _exact_wj(ka, kb)
        perms = 1024
        sa, sb = _sig_pair(ka, kb, perms, seed=trial)
        est = float(np.mean(sa == sb))
        tol = 4.5 * np.sqrt(max(exact * (1 - exact), 0.01) / perms)
        assert abs(est - exact) <= tol, (trial, exact, est, tol)


def test_frequency_sensitivity_vs_set_minhash():
    # same token SET, very different frequencies: weighted J must be
    # low while set Jaccard is 1
    wa = {"x": 100, "y": 1}
    wb = {"x": 1, "y": 100}
    exact = _exact_wj(wa, wb)  # 2/200 = 0.01
    sa, sb = _sig_pair(wa, wb, 512)
    est = float(np.mean(sa == sb))
    assert est <= 0.08  # ~0.01 expected; generous noise bound


def test_token_weight_extraction():
    uh, w, starts = _doc_token_weights(
        ["a a b", "", "c c c c"], seed=1)
    assert starts.tolist() == [0, 2, 2, 3]
    assert sorted(w[:2].tolist()) == [1.0, 2.0]
    assert w[2] == 4.0


def test_spark_pipeline_finds_frequency_dups(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta " * 8  # 64 toks
    rows = [(0, base),
            (1, base + "alpha beta gamma "),   # J_w = 64/67 ~ 0.955
            (2, "totally different words entirely unrelated content "
                "here now " * 8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"]): r["wjaccard"]
             for r in near_dup_pairs_weighted(df, threshold=0.7).collect()}
    assert (0, 1) in pairs
    assert abs(pairs[(0, 1)] - 8 * 8 / (8 * 8 + 3)) < 1e-9
    assert not any(2 in p for p in pairs)


def test_exact_wjaccard_udf(spark):
    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "a b b")], "doc_id long, text string")
    pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    r = weighted_jaccard_exact(pairs, docs).collect()[0]
    assert abs(r["wjaccard"] - 2 / 4) < 1e-12


def test_unicode_whitespace_docs_never_band_weighted(spark):
    # parallel to the set-MinHash regression: tab/newline/NBSP-only
    # texts must get NULL weighted signatures and never enter banding
    from algebird_spark.operators.weighted_minhash import \
        add_weighted_minhash_signature
    docs = spark.createDataFrame(
        [(0, "\t"), (1, "\n"), (2, " "), (3, ""),
         (4, "real words in a document here")],
        "doc_id long, text string")
    signed = add_weighted_minhash_signature(docs)
    nulls = {r["doc_id"] for r in
             signed.filter("wminhash IS NULL").collect()}
    assert nulls == {0, 1, 2, 3}
    assert near_dup_pairs_weighted(docs).count() == 0
