"""Deduplication operators for training-data pipelines over the
``documents`` table: exact, MinHash+LSH near-dup, SimHash near-dup,
n-gram Jaccard verification. Scale design:

* exact: hash-groupBy on a 128-bit fingerprint — one shuffle on an
  evenly distributed key; at 100 TB use the fingerprint, never the text.
* MinHash LSH: signature per doc (vectorized pandas UDF over Arrow
  batches), explode band buckets, self-join on (band, bucket) — the
  join key space is uniform, so no skew; candidate pairs then verified
  with exact shingle Jaccard only on the (tiny) candidate set.
* SimHash: 64-bit fingerprint via one explode+groupBy (text.py), then
  band the 64 bits into 4 x 16-bit keys; pairs agreeing on any band are
  candidates (Hamming distance <= 3 guaranteed found at 4 bands).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..functions.hashing import affine_mod_p61, murmur3_x64_128
from .text import fingerprint, simhash64_df


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dup_groups(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(fingerprint, n_dups, doc_ids) for every text occurring > once."""
    return (df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
              .groupBy("fp")
              .agg(F.count("*").alias("n_dups"),
                   F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
              .filter(F.col("n_dups") > 1))


def dedup_exact(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep one doc (min id) per distinct text."""
    w_min = (df.select(F.col(id_col).alias("__keep"),
                       fingerprint(F.col(text_col)).alias("fp"))
               .groupBy("fp").agg(F.min("__keep").alias("__keep")))
    return (df.withColumn("fp", fingerprint(F.col(text_col)))
              .join(w_min, on="fp", how="inner")
              .filter(F.col(id_col) == F.col("__keep"))
              .drop("fp", "__keep"))


# ---------------------------------------------------------------------------
# shingling + MinHash signatures (vectorized pandas UDF)
# ---------------------------------------------------------------------------

def _shingles(text: str, n: int) -> set[int]:
    words = text.lower().split()
    if len(words) < n:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i:i + n]) for i in range(len(words) - n + 1)]
    return {murmur3_x64_128(g.encode("utf-8"))[0] for g in grams}


def add_minhash_signature(df: DataFrame, text_col: str = "text",
                          num_perm: int = 64, shingle_n: int = 3,
                          seed: int = 12345678,
                          alias: str = "minhash") -> DataFrame:
    """array<bigint> MinHash signature per doc over word n-gram shingles.

    Arrow-batched: one pandas UDF call per ~10k docs; the per-doc lane
    minimum is a single numpy reduction over the (shingles x lanes)
    universal-hash matrix."""
    p61 = (1 << 61) - 1
    rng = np.random.default_rng(seed)
    a = rng.integers(1, p61, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, p61, size=num_perm, dtype=np.int64).astype(np.uint64)

    @F.pandas_udf("array<long>")
    def sig(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in texts:
            out = []
            for t in s:
                sh = _shingles(t or "", shingle_n)
                if not sh:
                    out.append([0] * num_perm)
                    continue
                hv = np.fromiter(sh, dtype=np.uint64, count=len(sh)) & np.uint64(p61)
                # exact Mersenne-prime affine hash (wrapping % loses
                # the universal-family guarantee)
                lanes = affine_mod_p61(a[None, :], hv[:, None], b[None, :])
                out.append(lanes.min(axis=0).astype(np.int64).tolist())
            yield pd.Series(out)

    return df.withColumn(alias, sig(F.col(text_col)))


def lsh_candidate_pairs(df: DataFrame, id_col: str = "doc_id",
                        sig_col: str = "minhash", bands: int = 16) -> DataFrame:
    """Docs sharing any LSH band bucket. Returns (id_a, id_b) with
    id_a < id_b, deduped. Band bucket = hash of the band's signature
    slice; the self-join key (band, bucket) is uniformly distributed."""
    sig_len_expr = F.size(sig_col)
    rows = F.floor(sig_len_expr / bands).cast("int")
    banded = df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.slice(F.col(sig_col), b * rows + 1, rows).cast("string"),
                    b.cast("string")))
        ).alias("band", "bucket"))
    left = banded.alias("l")
    right = banded.alias("r")
    return (left.join(right,
                      (F.col("l.band") == F.col("r.band"))
                      & (F.col("l.bucket") == F.col("r.bucket"))
                      & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
            .select(F.col(f"l.{id_col}").alias("id_a"),
                    F.col(f"r.{id_col}").alias("id_b"))
            .distinct())


def jaccard_verify(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", shingle_n: int = 3,
                   threshold: float = 0.7) -> DataFrame:
    """Exact word-shingle Jaccard on candidate pairs only.
    Returns (id_a, id_b, jaccard) filtered to >= threshold."""
    sh = df.select(
        F.col(id_col),
        F.array_distinct(F.transform(
            F.sequence(
                F.lit(0),
                F.greatest(F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
                           - shingle_n, F.lit(0))),
            lambda i: F.xxhash64(F.concat_ws(
                " ", F.slice(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                             i + 1, shingle_n)))
        )).alias("sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    joined = (pairs.join(a, pairs.id_a == F.col(f"a.{id_col}"))
                   .join(b, pairs.id_b == F.col(f"b.{id_col}")))
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    return (joined.select("id_a", "id_b",
                          (inter / union).alias("jaccard"))
                  .filter(F.col("jaccard") >= threshold))


def near_dup_pairs_minhash(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", num_perm: int = 64,
                           bands: int = 16, shingle_n: int = 3,
                           threshold: float = 0.7) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: sign -> band -> bucket-join
    -> exact-Jaccard verify."""
    signed = add_minhash_signature(df, text_col, num_perm, shingle_n)
    cands = lsh_candidate_pairs(signed, id_col, "minhash", bands)
    return jaccard_verify(df, cands, id_col, text_col, shingle_n, threshold)


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

def near_dup_pairs_simhash(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", max_hamming: int = 3) -> DataFrame:
    """SimHash banding: 4 x 16-bit bands; Hamming <= 3 implies at least
    one band matches exactly (pigeonhole). Verify candidates by popcount
    of xor. Returns (id_a, id_b, hamming)."""
    sh = simhash64_df(df, id_col, text_col)
    banded = sh.select(
        id_col, "simhash",
        F.posexplode(F.array(*[
            F.shiftrightunsigned(F.col("simhash"), 16 * i)
             .bitwiseAND(F.lit(0xFFFF)).cast("int")
            for i in range(4)])).alias("band", "bucket"))
    l, r = banded.alias("l"), banded.alias("r")
    cands = (l.join(r, (F.col("l.band") == F.col("r.band"))
                    & (F.col("l.bucket") == F.col("r.bucket"))
                    & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
             .select(F.col(f"l.{id_col}").alias("id_a"),
                     F.col(f"r.{id_col}").alias("id_b"),
                     F.col("l.simhash").alias("sh_a"),
                     F.col("r.simhash").alias("sh_b"))
             .distinct())
    xor = F.col("sh_a").bitwiseXOR(F.col("sh_b"))
    ham = F.bit_count(xor)
    return (cands.select("id_a", "id_b", ham.alias("hamming"))
                 .filter(F.col("hamming") <= max_hamming))
