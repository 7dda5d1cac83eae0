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

from .agg import (present_explode, sketch_by_key, sketch_global,
                  sketch_rollup, with_presented)
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


def distinct_rollup(df: DataFrame, col: str, by: Sequence[str],
                    error: float = 0.01, grouping: str = "rollup",
                    fanout: int = 0,
                    sets: Sequence[Sequence[str]] | None = None) -> DataFrame:
    """Approximate distinct count at EVERY ``by`` grouping level from
    one input scan (``agg.sketch_rollup``): the finest HLL states build
    once; coarser levels merge those states — monoid associativity
    makes the extra levels free of corpus passes. Returns ``by...,
    grouping_id, n_values, estimate, low, high`` (``n_values`` = rows
    folded into the level) with SQL ROLLUP/CUBE null semantics
    (``grouping_id`` disambiguates rolled-up NULLs)."""
    p = bits_for_error(error)
    levels = sketch_rollup(df, by, col, lambda: HLL(p=p),
                           grouping=grouping, fanout=fanout, sets=sets)
    return with_presented(
        levels,
        lambda sk: {"estimate": sk.estimate(),
                    "low": sk.approximate_size().low,
                    "high": sk.approximate_size().high},
        "estimate double, low double, high double")


def quantile_rollup(df: DataFrame, col: str, by: Sequence[str],
                    quantiles: Sequence[float] = (0.25, 0.5, 0.75, 0.95),
                    k: int = 200, grouping: str = "rollup",
                    fanout: int = 0,
                    sets: Sequence[Sequence[str]] | None = None) -> DataFrame:
    """Approximate quantiles at EVERY ``by`` grouping level from one
    input scan: the finest KLL(k) states build once
    (``agg.sketch_rollup``); coarser levels merge those states — the
    same monoid associativity as ``distinct_rollup``, so the extra
    levels never rescan the corpus. Returns one row per
    (level row, quantile): ``by..., grouping_id, p, estimate, low,
    high`` where [low, high] is the KLL rank-error bound interval and
    ``grouping_id`` carries SQL ROLLUP/CUBE null semantics."""
    ps = [float(q) for q in quantiles]
    levels = sketch_rollup(df, by, col, lambda: KLL(k=k),
                           grouping=grouping, fanout=fanout, sets=sets)

    def present(sk):
        if sk.n == 0:
            return []  # no quantiles of an empty level (empty input)
        out = []
        for p in ps:
            lo, hi = sk.quantile_bounds(p)
            out.append({"p": p, "estimate": float(sk.quantile(p)),
                        "low": float(lo), "high": float(hi)})
        return out

    return present_explode(
        levels, present, "p double, estimate double, low double, high double")


def topk_rollup(df: DataFrame, col: str, by: Sequence[str], k: int = 5,
                capacity: int = 4096, grouping: str = "rollup",
                fanout: int = 0,
                sets: Sequence[Sequence[str]] | None = None) -> DataFrame:
    """Top-k heavy hitters at EVERY ``by`` grouping level from one
    input scan: finest SpaceSaver(capacity) states build once
    (``agg.sketch_rollup``); coarser levels merge those states
    (SpaceSaver.scala:124-160 merge semantics). Returns one row per
    (level row, rank): ``by..., grouping_id, rank, item, cnt,
    guaranteed`` — ``guaranteed`` is SpaceSaver's membership certainty
    flag (count - error >= next count); with capacity above the level's
    cardinality the counts are exact."""
    from pyspark.sql.types import IntegerType, LongType, ShortType, StringType

    from .sketches import SpaceSaver
    col_t = df.schema[col].dataType
    if not isinstance(col_t, (StringType, LongType, IntegerType, ShortType)):
        raise ValueError(
            f"topk_rollup needs a string or integer item column; {col} is "
            f"{col_t.simpleString()} (SpaceSaver tracks labels only for "
            "those — other dtypes would surface opaque hashed keys)")
    levels = sketch_rollup(df, by, col,
                           lambda: SpaceSaver(capacity=capacity),
                           grouping=grouping, fanout=fanout, sets=sets)

    def present(sk):
        return [{"rank": i + 1,
                 "item": item if isinstance(item, str) else int(item),
                 "cnt": int(c), "guaranteed": bool(g)}
                for i, (item, c, _e, g) in enumerate(sk.top_k(k))]

    item_t = "string" if isinstance(col_t, StringType) else "long"
    return present_explode(
        levels, present,
        f"rank long, item {item_t}, cnt long, guaranteed boolean")


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


def estimate_join_size(left: DataFrame, left_key: str,
                       right: DataFrame, right_key: str | None = None,
                       eps: float = 0.0005, delta: float = 1e-6,
                       fanout: int = 16):
    """Approximate inner-join output cardinality WITHOUT running the
    join: two independent CMS passes (one scan each, no shuffle of the
    join itself), then ``innerProduct`` = sum_k fL(k)*fR(k) — the CMS
    join-size estimator (CountMinSketch.scala innerProduct semantics;
    the classic Cormode-Muthukrishnan application). Returns the
    ``Approximate`` interval: never under the true size; over by at
    most ``eps * |L| * |R|`` w.p. 1-delta. Use it to pick a join
    strategy (broadcast vs shuffle vs skew route) before paying for
    the join at 100 TB."""
    right_key = right_key or left_key
    factory = lambda: CMS(eps=eps, delta=delta)  # noqa: E731
    skl = sketch_global(left, left_key, factory, fanout=fanout)
    skr = sketch_global(right, right_key, factory, fanout=fanout)
    return skl.inner_product(skr)


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


def dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
          near: str | None = "minhash", threshold: float = 0.7,
          min_chars: int = 0, min_tokens: int = 0,
          approx_rows: int | None = None) -> DataFrame:
    """One-call corpus dedup: optional quality gate -> exact dedup ->
    (optional) near-dup pairs -> connected-component clustering ->
    one survivor (min id) per cluster. Returns the surviving rows.
    ``near``: 'minhash' (shingle-Jaccard >= threshold), 'simhash'
    (Hamming <= 3), 'ngram' (EXACT inverted-index shingle-Jaccard >=
    threshold, recall 1.0), or None for exact-only. ``approx_rows``: cheap
    corpus-size hint (catalog statistic) that sizes simhash banding —
    pass it at >= 2M docs."""
    from .operators.pipeline import dedup_pipeline

    stages = dedup_pipeline(df, text_col, id_col, near=near,
                            threshold=threshold, min_chars=min_chars,
                            min_tokens=min_tokens, approx_rows=approx_rows)
    return stages["exact_kept"] if near is None else stages["survivors"]


def ann_topk(vectors: DataFrame, queries: DataFrame, k: int = 10,
             method: str = "ivf", **kw) -> DataFrame:
    """Top-k cosine neighbors per query row ((q_id, q_vec) columns).
    method: 'exact' (brute force — the small-scale oracle),
    'exact_kernel' (BLAS-scored brute force, ~10x faster, same
    results), 'ivf'
    (spherical-k-means inverted lists; kw: n_lists=16, nprobe=4,
    n_iter=5, spill_margin=0.0 boundary-spill assignment,
    residual_probes=False), or 'lsh' (multi-table hyperplane LSH;
    kw: n_planes, n_tables, dim)."""
    from .operators import similarity as _s
    if method == "exact":
        return _s.cosine_topk(vectors, queries, k, **kw)
    if method == "exact_kernel":
        return _s.cosine_topk_kernel(vectors, queries, k, **kw)
    if method == "ivf":
        cents = _s.train_ivf_centroids(
            vectors, n_lists=kw.pop("n_lists", 16),
            n_iter=kw.pop("n_iter", 5),
            vec_col=kw.get("vec_col", "embedding"),
            id_col=kw.get("id_col", "vec_id"))
        return _s.ivf_topk(vectors, queries, k, cents,
                           nprobe=kw.pop("nprobe", 4), **kw)
    if method == "ivf_indexed":
        # materialized __list-partitioned index: kw must carry
        # index_path (written via operators.similarity.write_ivf_index)
        # and centroids; probes become a static pruning predicate
        path = kw.pop("index_path")
        cents = kw.pop("centroids")
        return _s.ivf_topk_indexed(vectors.sparkSession, path, queries,
                                   k, cents, nprobe=kw.pop("nprobe", 4),
                                   **kw)
    if method == "lsh":
        if "dim" not in kw:
            kw["dim"] = len(vectors.select(
                kw.get("vec_col", "embedding")).first()[0])
        return _s.lsh_multitable_topk(vectors, queries, k, **kw)
    if method in ("pq", "ivf_pq"):
        # NOTE: PQ paths rank by squared L2 (== cosine order only for
        # normalized vectors). kw: m=8, k_sub=256, n_iter=6, rerank=0
        # (exact re-score depth; >= k restores exact ranking over the
        # candidate set), and for ivf_pq: n_lists=64, nprobe=8.
        from .operators import pq as _pq
        vec_col = kw.pop("vec_col", "embedding")
        id_col = kw.pop("id_col", "vec_id")
        m = kw.pop("m", 8)
        k_sub = kw.pop("k_sub", 256)
        n_iter = kw.pop("n_iter", 6)
        rerank = kw.pop("rerank", 0)
        if method == "pq":
            cb = _pq.train_pq_codebook(vectors, m=m, k_sub=k_sub,
                                       n_iter=n_iter, vec_col=vec_col,
                                       id_col=id_col)
            enc = _pq.encode_pq(vectors, cb, vec_col=vec_col)
            return _pq.pq_topk(enc, queries, k, cb, rerank=rerank,
                               vectors=vectors if rerank else None,
                               id_col=id_col, vec_col=vec_col, **kw)
        coarse = _pq.train_coarse_centroids(
            vectors, n_lists=kw.pop("n_lists", 64), n_iter=n_iter,
            vec_col=vec_col, id_col=id_col)
        cb = _pq.train_pq_codebook(
            _pq.residual_vectors(vectors, coarse, vec_col, id_col),
            m=m, k_sub=k_sub, n_iter=n_iter, vec_col=vec_col,
            id_col=id_col)
        enc = _pq.encode_ivf_pq(vectors, coarse, cb, vec_col, id_col)
        return _pq.ivf_pq_topk(enc, queries, k, coarse, cb,
                               nprobe=kw.pop("nprobe", 8), rerank=rerank,
                               vectors=vectors if rerank else None,
                               id_col=id_col, vec_col=vec_col, **kw)
    raise ValueError(f"unknown ANN method {method!r}")


def covariance_sketch(df: DataFrame, col: str = "embedding",
                      ell: int = 16):
    """FrequentDirections matrix sketch of an embedding column — the
    mergeable covariance/PCA summary (one distributed pass; PSD order
    + ||A||_F^2/ell spectral bound; `.gram()`, `.singular_values()`,
    `.top_directions(r)` on the result). Feed `.top_directions(r)` to
    `operators.pq.fd_project` to reduce dimensionality before ANN
    indexing."""
    from pyspark.sql import functions as F

    from .agg import sketch_global
    from .sketches import FrequentDirections
    nn = df.filter(F.col(col).isNotNull())
    head = nn.select(col).first()
    if head is None:
        raise ValueError(
            f"covariance_sketch: no non-null vectors in {col!r}")
    d = len(head[0])
    return sketch_global(nn, col, lambda: FrequentDirections(d, ell))


def release_dedup_caches(op: str | None = None) -> None:
    """Unpersist the near-dup operators' internal caches (signature
    and candidate tables). Each operator releases its previous
    invocation's blocks automatically on the next call; batch jobs
    that finish with a dedup stage call this for deterministic
    cleanup. ``op``: one of 'minhash', 'minhash_cands',
    'jaccard_verify_shingles', 'simhash', 'weighted_minhash', or None
    for all; near_dup_pairs_* results also carry a per-invocation
    ``_algebird_cache`` handle."""
    from .operators.dedup import release_caches
    release_caches(op)


def distinct_count_per_key(df: DataFrame, key_col: str, value_col: str,
                           eps: float = 0.01, delta: float = 0.01,
                           p: int = 12, heavy_hitters_count: int = 10):
    """Approximate distinct ``value_col`` count per ``key_col`` in ONE
    fixed-size state (SketchMapHLL — the V=HLL instance of the
    reference's generic SketchMap): ship the returned state anywhere
    and batch-query it with ``.values(keys)``; ``heavy_hitters()``
    gives the top keys by estimated distinct count. Returns the merged
    sketch (driver-side object), built with the scale topology."""
    from .agg import sketch_by_key_multi
    from .sketches import SketchMapHLL, from_bytes

    factory = lambda: SketchMapHLL(eps=eps, delta=delta, p=p,  # noqa: E731
                                   heavy_hitters_count=heavy_hitters_count)
    rows = sketch_by_key_multi(df, [], [key_col, value_col],
                               factory).collect()
    if not rows:  # monoid zero on empty input, like sketch_global
        return factory()
    return from_bytes(bytes(rows[0]["sketch_state"]))


def cumulative_distinct(df: DataFrame, col: str, by: Sequence[str],
                        step_col: str, bits: int = 12) -> DataFrame:
    """Cumulative distinct count per key over an ordered step column —
    the "HLL scan" (reference ``Scan.fromMonoidAggregator``): one row
    per (keys, step) estimating distinct ``col`` values seen through
    that step. Build cost = one keyed sketch build + a state-sized
    cumulative fold; never an expanding exact window."""
    from .agg import sketch_by_key
    from .operators.scan import sketch_scan
    from .sketches import HLL

    states = sketch_by_key(df, list(by) + [step_col], col,
                           lambda: HLL(p=bits))
    return sketch_scan(states, list(by), step_col)


def scan_fold(df: DataFrame, keys: Sequence[str], order, step, init,
              output_col: str = "scan_out",
              output_type: str = "double") -> DataFrame:
    """General ``Scan.from(initialState)(fn)``: fold
    ``step(state, row) -> (new_state, output)`` per key in ``order``
    (one shuffle; state never leaves the task). For transitions
    expressible as vectorized group kernels use
    ``operators.scan.GeneralScan.apply_batch`` (per-group) or
    ``apply_stream`` (partition-ordered, one Python call per Arrow
    batch — the right shape at high key cardinality); for running
    aggregates use the window-expression ``operators.scan.Scan``
    (pure JVM)."""
    from .operators.scan import Scan
    return Scan.from_fn(step, init).apply(df, keys, order, output_col,
                                          output_type)


def sessionize(df: DataFrame, user_col: str, ts_col: str,
               gap: float = 1800.0, order: Sequence[str] | None = None,
               output_col: str = "session") -> DataFrame:
    """Number sessions per user: a new session starts when the time
    since the user's previous event exceeds ``gap`` seconds. Runs as a
    partition-ordered streaming fold (``GeneralScan.apply_stream``:
    one Exchange on ``user_col``, in-partition sort, a single
    mapInPandas pass with carry-over state — flat cost in user
    cardinality; measured 40x over a per-group fold at 500k users).
    ``order`` defaults to ``[ts_col]``; add tie-breaker columns for a
    total order exactly as you would for a window."""
    from .operators.scan import GeneralScan, session_numbers_kernel
    return GeneralScan.apply_stream(
        df, [user_col], list(order) if order else [ts_col],
        session_numbers_kernel(user_col, ts_col, gap),
        output_col, "bigint")


def semi_join_prune(big: DataFrame, keys: DataFrame, big_key: str,
                    keys_key: str | None = None,
                    fp_prob: float = 0.01) -> DataFrame:
    """Bloom-prune ``big`` to rows whose key may appear in ``keys``:
    a no-false-negative superset filter evaluated in the scan stage
    (see operators/joins.py — follow with a real join to drop the
    bounded false-positive residue)."""
    from .operators.joins import bloom_prune
    return bloom_prune(big, keys, big_key, keys_key or big_key,
                       fp_prob=fp_prob)


def join_pruned(big: DataFrame, small: DataFrame, big_key: str,
                small_key: str | None = None, how: str = "inner",
                fp_prob: float = 0.01) -> DataFrame:
    """Exact inner/semi join with the big side Bloom-pruned before the
    shuffle (operators/joins.py:bloom_join)."""
    from .operators.joins import bloom_join
    return bloom_join(big, small, big_key, small_key, how=how,
                      fp_prob=fp_prob)


def join_skewed(big: DataFrame, small: DataFrame, big_key: str,
                small_key: str | None = None, how: str = "inner",
                min_share: float = 0.005) -> DataFrame:
    """Exact join with SpaceSaver-detected hot keys routed through a
    broadcast path so they never shuffle (operators/joins.py:skew_join)."""
    from .operators.joins import skew_join
    return skew_join(big, small, big_key, small_key, how=how,
                     min_share=min_share)


def join_asof(left: DataFrame, right: DataFrame, key: str,
              left_ts: str = "ts", right_ts: str = "ts",
              **kw) -> DataFrame:
    """Backward as-of join: each left row gets the right row with the
    greatest right_ts <= left_ts per key (operators/joins.py:asof_join
    — union + one window carry-forward, one shuffle, no range
    blow-up)."""
    from .operators.joins import asof_join
    return asof_join(left, right, key, left_ts=left_ts,
                     right_ts=right_ts, **kw)


def build_dedup_index(docs: DataFrame, path: str, **kw) -> dict:
    """Persist a MinHash-LSH near-dup index (band buckets + stored
    shingles + config manifest) for incremental corpus dedup
    (sources/lsh_index.py:write_minhash_index); ``mode='append'`` grows
    it with each kept increment."""
    from .sources.lsh_index import write_minhash_index
    return write_minhash_index(docs, path, **kw)


def dedup_incremental(new_docs: DataFrame, index_path: str,
                      threshold: float = 0.7, id_col: str = "doc_id",
                      **kw) -> DataFrame:
    """The daily-increment cycle's filter: drop every new doc that
    near-duplicates (exact shingle Jaccard >= threshold on LSH
    candidates) something already in the index; append the survivors
    with ``build_dedup_index(mode='append')``."""
    from pyspark.sql import functions as F

    from .sources.lsh_index import near_dups_against_index
    pairs = near_dups_against_index(new_docs.sparkSession, index_path,
                                    new_docs, threshold=threshold,
                                    id_col=id_col, **kw)
    dup_ids = pairs.select(F.col("new_id").alias(id_col)).distinct()
    return new_docs.join(dup_ids, id_col, "left_anti")


def top_k_exact_pruned(df: DataFrame, keys: Sequence[str], order_col: str,
                       k: int, **kw) -> DataFrame:
    """Exact per-group top-k with the ranking window pruned to
    ~k + O(eps*n) scan-stage survivors by a KLL cutoff; verified and
    fallback-exact (operators/topk.py:top_k_pruned)."""
    from .operators.topk import top_k_pruned
    return top_k_pruned(df, keys, order_col, k, **kw)


def sample_weighted(df: DataFrame, k: int, weight_col: str,
                    by: Sequence[str] = (), id_col: str = "doc_id",
                    **kw) -> DataFrame:
    """Deterministic weighted sample without replacement (A-ES on an
    md5-derived uniform — reproducible across engines and reruns;
    operators/topk.py:weighted_sample)."""
    from .operators.topk import weighted_sample
    return weighted_sample(df, k, weight_col, by=by, id_col=id_col, **kw)


def mix_by_budget(docs: DataFrame, total_budget: float | None = None,
                  budget: dict | None = None, mix=None,
                  by: str = "source", id_col: str = "doc_id",
                  text_col: str = "text",
                  token_col: str | None = None) -> DataFrame:
    """Deterministic token-budget data mixing: downsample each group so
    its expected token mass meets its budget; identical keep-set on any
    engine and any rerun (operators/exact.py:token_budget_sample)."""
    from .operators.exact import token_budget_sample
    return token_budget_sample(docs, by=by, id_col=id_col,
                               text_col=text_col, token_col=token_col,
                               budget=budget, total_budget=total_budget,
                               mix=mix)


def train_val_test(df: DataFrame, fractions: dict | None = None,
                   id_col: str = "doc_id", salt: str = "split") -> DataFrame:
    """Deterministic, engine-portable split assignment (adds
    ``__split``); stable under corpus growth
    (operators/exact.py:assign_splits)."""
    from .operators.exact import assign_splits
    return assign_splits(df, fractions or {"train": 0.9, "val": 0.05,
                                           "test": 0.05},
                         id_col=id_col, salt=salt)
