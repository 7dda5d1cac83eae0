"""Feature hashing (HashingTrick) — reference parity and monoid law.

Reference: core/HashingTrick.scala:19-38 (index = murmur128.h1 & mask,
value negated when h2 & 1 == 1, vector sum monoid, default seed
123456).
"""

import numpy as np

from pyspark.sql import functions as F

from algebird_spark.functions.hashing import murmur3_x64_128
from algebird_spark.operators.features import (DEFAULT_SEED,
                                               feature_hash_kernel,
                                               feature_hash_vector)


def test_kernel_matches_scalar_reference_semantics():
    keys = ["alpha", "beta", "", "the quick brown fox", "x" * 100]
    idx, sign = feature_hash_kernel(np.array(keys, dtype=object), 10)
    for k, i, s in zip(keys, idx, sign):
        h1, h2 = murmur3_x64_128(k.encode(), DEFAULT_SEED)
        assert i == (h1 & ((1 << 10) - 1))
        assert s == (-1 if (h2 & 1) else 1)
        assert 0 <= i < 1024


def test_vector_monoid_law_on_spark(spark):
    rows = [(i, f"w{i % 37}") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, tok string")
    whole = feature_hash_vector(df, [], "tok", bits=8)
    halves = (feature_hash_vector(df.filter("doc_id % 2 = 0"), [], "tok",
                                  bits=8)
              .union(feature_hash_vector(df.filter("doc_id % 2 = 1"), [],
                                         "tok", bits=8))
              .groupBy("f_index").agg(F.sum("f_value").alias("f_value"))
              .filter(F.col("f_value") != 0))
    a = {r["f_index"]: r["f_value"] for r in whole.collect()}
    b = {r["f_index"]: r["f_value"] for r in halves.collect()}
    assert a == b
    # counts of ±1 weights: total signed mass == sum of per-token signs
    assert sum(a.values()) == sum(
        int(s) for s in feature_hash_kernel(
            np.array([r[1] for r in rows], dtype=object), 8)[1])


def test_grouped_vectors_disjoint(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x")], "g string, tok string")
    out = feature_hash_vector(df, ["g"], "tok", bits=6).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], {})[r["f_index"]] = r["f_value"]
    # same token -> same index in both groups
    (xi,), (si,) = (feature_hash_kernel(np.array(["x"], dtype=object), 6))
    assert by_g["b"] == {int(xi): float(si)}
    assert abs(by_g["a"].get(int(xi), 0.0)) == 1.0
