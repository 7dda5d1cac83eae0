"""Feature hashing (the "hashing trick") — reference parity for
HashingTrickMonoid (core/HashingTrick.scala:19-38): a key hashes with
murmur128 to index = h1 & (2^bits - 1), and the value is NEGATED when
h2 & 1 == 1 (the sign trick that makes the estimator unbiased,
Weinberger et al., ICML 2009). The "vector" is kept sparse as
(group, index, value) rows — the relational AdaptiveVector: Spark
aggregates it with plain groupBy-sum (map-side partial combine), and
the monoid plus is just unioning rows before the sum.

Hashing is ONE vectorized murmur kernel call per Arrow batch
(bit-exact with the reference's MurmurHash128, same default seed);
everything downstream is JVM-side.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

# reference default: HashingTrickMonoid(bits, seed = 123456)
DEFAULT_SEED = 123456


def feature_hash_kernel(keys, bits: int, seed: int = DEFAULT_SEED
                        ) -> tuple[np.ndarray, np.ndarray]:
    """(index int64, sign ±1 int8) per key — the init() of the
    reference monoid, vectorized."""
    from ..functions.hashing import murmur128_any
    h1, h2 = murmur128_any(keys, seed)
    idx = (h1 & np.uint64((1 << bits) - 1)).astype(np.int64)
    sign = np.where((h2 & np.uint64(1)).astype(bool), -1, 1).astype(np.int8)
    return idx, sign


def with_feature_hash(df: DataFrame, key_col: str, bits: int = 12,
                      seed: int = DEFAULT_SEED,
                      index_col: str = "f_index",
                      sign_col: str = "f_sign") -> DataFrame:
    """Adds (index, sign) columns for ``key_col`` (string/bytes/int)."""

    @F.pandas_udf("struct<i: long, s: int>")
    def fh(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for s in it:
            if len(s) == 0:
                yield pd.DataFrame({"i": pd.Series([], dtype="int64"),
                                    "s": pd.Series([], dtype="int32")})
                continue
            idx, sign = feature_hash_kernel(s.to_numpy(), bits, seed)
            yield pd.DataFrame({"i": idx, "s": sign.astype(np.int32)})

    out = df.withColumn("__fh", fh(F.col(key_col)))
    return (out.withColumn(index_col, F.col("__fh.i"))
               .withColumn(sign_col, F.col("__fh.s"))
               .drop("__fh"))


def feature_hash_vector(df: DataFrame, group_cols: list[str], key_col: str,
                        bits: int = 12, seed: int = DEFAULT_SEED,
                        value_col: str | None = None) -> DataFrame:
    """Per-group sparse hashed feature vector as
    (group..., f_index, f_value) rows: the HashingTrickMonoid sum of
    init(key -> value) over the group (value defaults to 1.0 counts).
    One shuffle on (group, index); buckets are murmur-uniform so the
    key space cannot skew. Zero-cancelled buckets are dropped (sparse
    semantics — AdaptiveVector's zero elements)."""
    hashed = with_feature_hash(df, key_col, bits, seed)
    val = (F.col(value_col) if value_col is not None else F.lit(1.0))
    return (hashed.groupBy(*group_cols, "f_index")
            .agg(F.sum(F.col("f_sign") * val).alias("f_value"))
            .filter(F.col("f_value") != 0))
