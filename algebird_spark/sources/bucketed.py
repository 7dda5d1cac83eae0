"""Bucketed-table layout: pre-shuffled storage so repeated joins and
aggregations on the bucket key run with NO exchange at read time — the
standard 100 TB technique for fact-to-fact joins (e.g. doc metadata
joined to signatures, orders to lineitems) that would otherwise
shuffle both sides on every query.

Spark's bucketing contract: ``bucketBy(n, keys).sortBy(keys)`` at write
time records bucket metadata in the catalog; a join of two tables
bucketed the SAME way (same keys, same n) is planned as a SortMergeJoin
with zero Exchange on either side. Catalyst proves it from metadata —
nothing here re-implements the join.

At warehouse scale pick n_buckets so each bucket file lands near the
scan target (128-512 MB); bucket counts must match across tables you
intend to co-join (or be integer multiples with
spark.sql.bucketing.coalesceBucketsInJoin.enabled).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, keys: list[str],
                   n_buckets: int, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a catalog table bucketed (and bucket-sorted)
    by ``keys`` — one shuffle now, none at every later join/agg."""
    w = df.write.mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def cojoin(spark: SparkSession, left_table: str, right_table: str,
           keys: list[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket keys; the plan
    must contain no Exchange (gated in tests/test_plans.py)."""
    return spark.table(left_table).join(spark.table(right_table), keys, how)
