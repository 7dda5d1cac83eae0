"""Similarity search over embedding columns (``array<float>``).

* ``cosine_topk`` — brute-force exact cosine top-k: the baseline and
  small-scale oracle. Dot products are built-in higher-order functions
  (``zip_with`` + ``aggregate``), fully JVM-side; the query set is
  broadcast so the scan side never shuffles.
* ``lsh_bucketed_topk`` — the scale path: random-hyperplane LSH
  (SimHash for vectors) assigns each vector to buckets; candidates are
  only compared within matching buckets. Recall < 1 by design; at
  100 TB this turns an O(N*Q) scan into O(N) bucketing + a skew-free
  bucket join.
* ``embedding_cosine_dups`` — near-duplicate pairs by cosine >= t.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(vectors: DataFrame, queries: DataFrame, k: int,
                id_col: str = "vec_id", vec_col: str = "embedding",
                q_id_col: str = "q_id", q_vec_col: str = "q_vec") -> DataFrame:
    """Exact top-k neighbors per query: broadcast the (small) query set,
    one pass over the vector table, per-query window top-k.
    Returns (q_id, vec_id, cos, rank)."""
    joined = vectors.crossJoin(F.broadcast(queries))
    scored = joined.select(
        F.col(q_id_col), F.col(id_col),
        cosine(F.col(vec_col), F.col(q_vec_col)).alias("cos"))
    scored = scored.filter(F.col(id_col) != F.col(q_id_col))
    w = Window.partitionBy(q_id_col).orderBy(F.col("cos").desc(), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k))


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float32)


def hyperplane_bucket(vec: Column, planes: np.ndarray) -> Column:
    """Sign-pattern bucket id from n_planes random hyperplanes —
    built-in expressions only (per-plane dot via zip_with over a
    literal array)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(vec, lit_plane) >= 0,
                     F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                         F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(bit)
    return bucket


def lsh_bucketed_topk(vectors: DataFrame, queries: DataFrame, k: int,
                      dim: int, n_planes: int = 8, seed: int = 42,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      q_id_col: str = "q_id", q_vec_col: str = "q_vec") -> DataFrame:
    """Approximate top-k: compare only vectors sharing the query's
    hyperplane bucket. Recall grows with fewer planes (bigger buckets).
    Returns (q_id, vec_id, cos, rank)."""
    planes = random_hyperplanes(dim, n_planes, seed)
    v = vectors.withColumn("__bucket", hyperplane_bucket(F.col(vec_col), planes))
    q = queries.withColumn("__bucket", hyperplane_bucket(F.col(q_vec_col), planes))
    joined = v.join(F.broadcast(q), on="__bucket")
    scored = joined.select(
        F.col(q_id_col), F.col(id_col),
        cosine(F.col(vec_col), F.col(q_vec_col)).alias("cos"))
    scored = scored.filter(F.col(id_col) != F.col(q_id_col))
    w = Window.partitionBy(q_id_col).orderBy(F.col("cos").desc(), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k))


def embedding_cosine_dups(vectors: DataFrame, threshold: float,
                          dim: int, n_planes: int = 6, seed: int = 42,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """Near-duplicate vector pairs with cos >= threshold, LSH-bucketed
    self-join (exact within buckets). Returns (id_a, id_b, cos)."""
    planes = random_hyperplanes(dim, n_planes, seed)
    b = vectors.withColumn("__bucket", hyperplane_bucket(F.col(vec_col), planes))
    l, r = b.alias("l"), b.alias("r")
    pairs = (l.join(r, (F.col("l.__bucket") == F.col("r.__bucket"))
                    & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
             .select(F.col(f"l.{id_col}").alias("id_a"),
                     F.col(f"r.{id_col}").alias("id_b"),
                     cosine(F.col(f"l.{vec_col}"),
                            F.col(f"r.{vec_col}")).alias("cos")))
    return pairs.filter(F.col("cos") >= threshold)
