"""KLL-split range-partitioned parquet layout — sketches steering the
PHYSICAL layout, completing the triangle with the Bloom-pruned join
(scan-stage key pruning) and the SpaceSaver skew join (hot-key
routing):

* one mergeable KLL pass (sketches/kll.py; reference quantile
  aggregators, `QTree.scala` / KLL paper) yields n-quantile SPLITS;
* rows are bucketed by a pure fold expression over the split array
  (JVM-side, no UDF) and written ``partitionBy("__bucket")`` — each
  bucket holds ~1/n of the rows by construction (KLL rank error), so
  the layout is balanced without sampling reshuffles;
* a range predicate (``functions/interval.py``) then reads ONLY the
  overlapping bucket directories via static partition pruning — the
  same static-`isin` trick proven for the IVF index
  (`similarity.py::write_ivf_index`) — with the interval's exact
  predicate re-applied as the residual filter, so pruning mistakes are
  impossible: bucket selection is a superset, correctness comes from
  the predicate.

The splits are persisted in a manifest next to the data: stable across
runs and incremental appends (append with the SAME splits keeps the
layout consistent — re-deriving splits from a KLL of new data would
not), exactly like any other serialized sketch state.
"""

from __future__ import annotations

import json
import os
from bisect import bisect_right

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..agg import sketch_global
from ..functions.interval import Interval
from ..sketches import KLL

MANIFEST = "_range_manifest.json"

__all__ = ["range_splits", "bucket_expr", "write_range_partitioned",
           "read_range_pruned"]


def range_splits(df: DataFrame, col: str, n_buckets: int,
                 k: int = 400) -> list[float]:
    """n-quantile split points from one mergeable KLL pass; collapsed
    to a strictly increasing list (heavy repeated values merge their
    buckets rather than producing empty ones)."""
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    sk = sketch_global(df, col, lambda: KLL(k=k))
    out: list[float] = []
    for i in range(1, n_buckets):
        q = float(sk.quantile(i / n_buckets))
        if not out or q > out[-1]:
            out.append(q)
    return out


def bucket_expr(col: str, splits: list[float]) -> Column:
    """#splits <= value, as a JVM-side fold over the split array —
    bucket 0 is (-inf, s0) plus NULLs (range predicates never match
    NULL, so they land with the residual-filtered rows)."""
    arr = F.array([F.lit(float(s)) for s in splits])
    return F.aggregate(
        arr, F.lit(0),
        lambda acc, s: acc + F.when(F.col(col) >= s, 1).otherwise(0))


def write_range_partitioned(df: DataFrame, col: str, path: str,
                            n_buckets: int = 16, k: int = 400,
                            splits: list[float] | None = None,
                            mode: str = "overwrite") -> list[float]:
    """Write ``df`` range-partitioned by KLL splits of ``col``; returns
    the splits (also persisted in the manifest).

    Incremental writes use ``mode='append'``: splits default to the
    EXISTING manifest's (appends must keep bucket boundaries stable or
    pruning breaks), and explicitly-passed splits are validated against
    it — a static partition overwrite would silently wipe the table, so
    appending with ``mode='overwrite'`` is never implied (ADVICE r5)."""
    if mode not in ("overwrite", "append"):
        raise ValueError("mode must be 'overwrite' or 'append'")
    manifest_path = os.path.join(path, MANIFEST)
    if mode == "append":
        if not os.path.exists(manifest_path):
            raise FileNotFoundError(
                f"append requires an existing layout manifest at "
                f"{manifest_path}; write with mode='overwrite' first")
        with open(manifest_path) as f:
            man = json.load(f)
        if man["col"] != col:
            raise ValueError(
                f"append column {col!r} != layout column {man['col']!r}")
        if splits is None:
            splits = man["splits"]
        elif [float(s) for s in splits] != [float(s) for s in man["splits"]]:
            raise ValueError(
                "append splits differ from the existing layout; "
                "rewrite with mode='overwrite' to change boundaries")
    elif splits is None:
        splits = range_splits(df, col, n_buckets, k=k)
    out = df.withColumn("__bucket", bucket_expr(col, splits))
    out.write.partitionBy("__bucket").mode(mode).parquet(path)
    # atomic manifest publish (same convention as sources/checkpoint.py)
    tmp = os.path.join(path, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump({"col": col, "splits": splits}, f)
    os.replace(tmp, os.path.join(path, MANIFEST))
    return splits


def _bucket_of(splits: list[float], v: float) -> int:
    return bisect_right(splits, v)


def read_range_pruned(spark: SparkSession, path: str,
                      interval: Interval) -> DataFrame:
    """Read only the bucket directories a range predicate can touch,
    then re-apply the exact interval predicate. Bucket selection is a
    SUPERSET (boundary/exclusivity conservatively included), so the
    result equals filtering the full table."""
    with open(os.path.join(path, MANIFEST)) as f:
        man = json.load(f)
    splits, col = man["splits"], man["col"]
    lo_b = 0 if interval.low is None else _bucket_of(splits, interval.low)
    hi_b = len(splits) if interval.high is None \
        else _bucket_of(splits, interval.high)
    df = spark.read.parquet(path)
    if (lo_b, hi_b) != (0, len(splits)):
        df = df.filter(F.col("__bucket").isin(list(range(lo_b, hi_b + 1))))
    return df.filter(interval.predicate(F.col(col))).drop("__bucket")
