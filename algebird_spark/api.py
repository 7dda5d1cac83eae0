"""High-level API — the algebird aggregator-sugar surface
(HyperLogLogAggregator.withBits/withError, CMS.aggregator,
BloomFilterAggregator, QTreeAggregator; core/HyperLogLog.scala:650-713,
core/Aggregator.scala sugar) as one-call DataFrame functions.

Every function runs the scale topology (partition combine -> tree
merge) and returns presented estimate columns; pass ``by=[...]`` for
per-key results.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

from .agg import sketch_by_key, sketch_global, with_presented
from .sketches import (CMS, HLL, KLL, BloomFilter, MinHash, TDigest,
                       bits_for_error)


def distinct_count(df: DataFrame, col: str, by: Sequence[str] = (),
                   error: float = 0.01, fanout: int = 0):
    """Approximate distinct count with relative error <= ``error``
    (HyperLogLogAggregator.withError analog).

    With ``by``: DataFrame of keys + (estimate, low, high) columns.
    Without: the Approximate interval."""
    p = bits_for_error(error)
    factory = lambda: HLL(p=p)  # noqa: E731
    if by:
        states = sketch_by_key(df, by, col, factory, fanout=fanout)
        return with_presented(
            states,
            lambda sk: {"estimate": sk.estimate(),
                        "low": sk.approximate_size().low,
                        "high": sk.approximate_size().high},
            "estimate double, low double, high double")
    return sketch_global(df, col, factory).approximate_size()


def heavy_hitters(df: DataFrame, col: str, by: Sequence[str] = (),
                  pct: float = 0.01, eps: float | None = None,
                  delta: float = 1e-6, fanout: int = 0):
    """Keys with frequency >= pct * total (TopPctCMS semantics: the
    result provably contains every such key and nothing below
    (pct - eps) * total w.p. 1-delta)."""
    eps = eps if eps is not None else pct / 10
    factory = lambda: CMS(eps=eps, delta=delta, heavy_hitters_pct=pct)  # noqa: E731
    if by:
        states = sketch_by_key(df, by, col, factory, fanout=fanout)
        return with_presented(
            states,
            lambda sk: {"heavy_hitters": [int(k) for k in sk.heavy_hitters()],
                        "total": int(sk.total)},
            "heavy_hitters array<long>, total long")
    return sketch_global(df, col, factory).heavy_hitters()


def frequency_sketch(df: DataFrame, col: str, eps: float = 0.001,
                     delta: float = 1e-6) -> CMS:
    """Global CMS for ad-hoc point/inner-product queries. Any key dtype:
    strings/bytes go through the canonical prepare_keys hash."""
    return sketch_global(df, col, lambda: CMS(eps=eps, delta=delta))


def top_k(df: DataFrame, col: str, k: int = 10, by: Sequence[str] = (),
          capacity: int | None = None, fanout: int = 0):
    """Top-k items with SpaceSaver per-item error bounds; string columns
    come back as the ORIGINAL strings (label tracking survives the
    distributed merge). With ``by``: DataFrame of keys + parallel arrays
    (items, counts, errors, guaranteed); without: the
    [(item, count, error, guaranteed)] list."""
    from .sketches import SpaceSaver
    capacity = capacity or max(k * 8, 256)
    factory = lambda: SpaceSaver(capacity=capacity)  # noqa: E731

    def present(sk):
        top = sk.top_k(k)
        return {"items": [str(i) for i, _c, _e, _g in top],
                "counts": [int(c) for _i, c, _e, _g in top],
                "errors": [int(e) for _i, _c, e, _g in top],
                "guaranteed": [bool(g) for _i, _c, _e, g in top]}

    if by:
        states = sketch_by_key(df, by, col, factory, fanout=fanout)
        return with_presented(
            states, present,
            "items array<string>, counts array<long>, "
            "errors array<long>, guaranteed array<boolean>")
    return sketch_global(df, col, factory).top_k(k)


def quantiles(df: DataFrame, col: str, probs: Sequence[float],
              by: Sequence[str] = (), k: int = 200, fanout: int = 0):
    """Approximate quantiles with KLL rank error eps(k) plus
    (lower, upper) bound columns (QTreeAggregator contract)."""
    factory = lambda: KLL(k=k)  # noqa: E731
    probs = list(probs)

    def present(sk):
        out = {}
        for p in probs:
            lo, hi = sk.quantile_bounds(p)
            out[f"q{str(p).replace('.', '_')}"] = sk.quantile(p)
            out[f"q{str(p).replace('.', '_')}_lo"] = lo
            out[f"q{str(p).replace('.', '_')}_hi"] = hi
        return out

    fields = ", ".join(
        f"q{str(p).replace('.', '_')} double, "
        f"q{str(p).replace('.', '_')}_lo double, "
        f"q{str(p).replace('.', '_')}_hi double" for p in probs)
    if by:
        states = sketch_by_key(df, by, col, factory, fanout=fanout)
        return with_presented(states, present, fields)
    sk = sketch_global(df, col, factory)
    return {p: sk.quantile_bounds(p) for p in probs}


def tdigest_quantiles(df: DataFrame, col: str, probs: Sequence[float],
                      by: Sequence[str] = (), compression: float = 200.0):
    factory = lambda: TDigest(compression)  # noqa: E731
    probs = list(probs)
    if by:
        states = sketch_by_key(df, by, col, factory)
        return with_presented(
            states,
            lambda sk: {f"q{str(p).replace('.', '_')}": sk.quantile(p)
                        for p in probs},
            ", ".join(f"q{str(p).replace('.', '_')} double" for p in probs))
    sk = sketch_global(df, col, factory)
    return {p: sk.quantile(p) for p in probs}


def membership_filter(df: DataFrame, col: str, expected_items: int,
                      fp_prob: float = 0.01) -> BloomFilter:
    """Global Bloom filter; query with ``.contains_batch(values)``."""
    return sketch_global(
        df, col, lambda: BloomFilter(num_entries=expected_items,
                                     fp_prob=fp_prob))


def jaccard_similarity(df: DataFrame, col: str, by: Sequence[str],
                       num_lanes: int = 256) -> DataFrame:
    """MinHash signature per key — feed pairs to ``MinHash.similarity``."""
    return sketch_by_key(df, by, col, lambda: MinHash(num_lanes=num_lanes))
