"""MapAlgebra parity operators (algebird-core .../MapAlgebra.scala)
beyond groupBy/cube/rollup (those live in operators/exact.py):

| algebird | here | reference |
|---|---|---|
| invert / invertExact | invert | MapAlgebra.scala:231-248 |
| toGraph | to_graph | MapAlgebra.scala:252-269 |
| dot (MapRing.times + sum) | sparse_dot | MapAlgebra.scala:271-272,138-160 |
| mergeLookup | merge_lookup | MapAlgebra.scala:183-188 |
| SetDiff monoid | set_diff_apply | SetDiff.scala:19-89 |
| GaussianDistribution monoid | gaussian_sum | statistics/GaussianDistributionMonoid.scala:11-31 |
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def invert(df: DataFrame, key: str, value: str) -> DataFrame:
    """Map inversion: value -> sorted set of keys that map to it."""
    return (df.groupBy(value)
              .agg(F.sort_array(F.collect_set(key)).alias("keys")))


def to_graph(df: DataFrame, src: str, dst: str) -> DataFrame:
    """Edge list -> adjacency: src -> sorted distinct neighbors."""
    return (df.groupBy(src)
              .agg(F.sort_array(F.collect_set(dst)).alias("neighbors"),
                   F.count_distinct(dst).alias("degree")))


def sparse_dot(left: DataFrame, right: DataFrame, key: str,
               lval: str, rval: str, alias: str = "dot") -> DataFrame:
    """Sparse-vector dot product: join on key, sum of products."""
    l = left.select(key, F.col(lval).alias("__l"))
    r = right.select(key, F.col(rval).alias("__r"))
    return l.join(r, key).agg(
        F.sum(F.col("__l") * F.col("__r")).alias(alias))


def merge_lookup(facts: DataFrame, lookup: DataFrame, key: str,
                 present_key: str, value: str) -> DataFrame:
    """Lookup-then-sum-by-presented-key: broadcast the lookup table,
    group by its presented column."""
    return (facts.join(F.broadcast(lookup), key)
                 .groupBy(present_key)
                 .agg(F.sum(value).alias("total")))


def set_diff_apply(base: Column, add: Column, remove: Column) -> Column:
    """SetDiff monoid applied to a set column: (base ∪ add) \\ remove,
    sorted for determinism. The (add, remove) pair composes
    associatively before application, like SetDiff.scala's merge."""
    return F.sort_array(F.array_except(F.array_union(base, add), remove))


def gaussian_sum(df: DataFrame, mean_col: str, var_col: str,
                 keys: Sequence[str] = ()) -> DataFrame:
    """Sum of independent normals: means add, variances add."""
    aggs = [F.sum(mean_col).alias("mean_sum"),
            F.sum(var_col).alias("variance_sum"),
            F.count("*").alias("n")]
    return df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)
