"""Distributed aggregation harness: the Spark-native replacement for
algebird's ``AlgebirdRDD.aggregate / aggregateByKey / sumByKey``
(algebird-spark .../AlgebirdRDD.scala:18-101), redesigned for
DataFrames + Arrow per SURVEY.md §3.2-3.3:

  1. **Map-side partition combine** (``mapInArrow``): every input
     partition folds its Arrow batches into one sketch state per group
     key — the analog of Spark's partial HashAggregate, which Catalyst
     cannot do for Python UDAFs. Only ``(key, state)`` rows ever cross
     a shuffle boundary; raw rows never do.
  2. **Tree merge**: per-key states merge via ``groupBy(keys)``; when
     the number of partition states is large, an intermediate salted
     round (``fanout`` buckets) keeps any single reducer's fan-in
     bounded — treeAggregate-style two-level merge, never
     ``repartition(1)`` on a big fan-in (the anti-pattern called out in
     AlgebirdRDD.scala:28).
  3. **present()**: decode the (few, one-per-group) final states into
     estimate columns.

Requires a commutative merge, exactly like the reference
(AlgebirdRDD.scala:17,37,47) — guaranteed by the sketch monoid laws
(tests/test_laws via each sketch's test module).
"""

from __future__ import annotations

from typing import Callable, Iterator, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

from .sketches import Sketch, from_bytes

STATE_COL = "sketch_state"
COUNT_COL = "n_values"

# Global (ungrouped) builds coalesce incoming Arrow batches to this
# many elements per update_batch call — small maxRecordsPerBatch
# settings otherwise turn a billion-row scan into ~500k fixed-cost
# kernel invocations. 64K keeps each call's working set cache-sized
# (the same chunk the kernels use internally).
_COALESCE_ELEMS = 65_536

SketchFactory = Callable[[], Sketch]


# ---------------------------------------------------------------------------
# element extraction: flatten value column (scalar or array<T>) per arrow batch
# ---------------------------------------------------------------------------

def _flatten_values(col: pa.Array) -> tuple[np.ndarray, np.ndarray | None]:
    """Return (element_values, per_row_lengths|None). Lengths are None for
    scalar columns (1 element per row). List offsets are handled zero-copy.

    Nulls follow SQL aggregate semantics (count_distinct etc. ignore
    them): null list elements are dropped from the flattened values; a
    scalar column with nulls would otherwise coerce to float NaN and be
    sketched as a value."""
    if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
        lengths = col.value_lengths().fill_null(0).to_numpy(zero_copy_only=False)
        flat = col.flatten()
        if flat.null_count:
            # exact per-row non-null counts: prefix-sum of the valid mask
            # sampled at row boundaries (np.add.reduceat mis-counts
            # when empty rows repeat a boundary or end the batch)
            import pyarrow.compute as pc
            valid = pc.is_valid(flat).to_numpy(zero_copy_only=False)
            starts = np.zeros(len(lengths) + 1, dtype=np.int64)
            np.cumsum(lengths, out=starts[1:])
            csum = np.zeros(len(valid) + 1, dtype=np.int64)
            np.cumsum(valid, out=csum[1:])
            lengths = csum[starts[1:]] - csum[starts[:-1]]
            flat = flat.drop_null()
        values = flat.to_numpy(zero_copy_only=False)
        return values, lengths
    if col.null_count:
        # scalar with nulls: keep alignment with per-row key codes by
        # reporting 0/1 elements per row
        import pyarrow.compute as pc
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        return (col.drop_null().to_numpy(zero_copy_only=False),
                valid.astype(np.int64))
    return col.to_numpy(zero_copy_only=False), None


def _key_frame(batch: pa.RecordBatch, keys: Sequence[str]) -> pd.DataFrame:
    return pa.Table.from_batches([batch]).select(list(keys)).to_pandas()


def _factorize_rows(kf: pd.DataFrame, keys: Sequence[str]):
    """Per-row group codes + unique key tuples. Null keys form their own
    group, matching SQL GROUP BY (factorize's default -1 sentinel would
    silently drop those rows from the sketch)."""
    if len(keys) == 1:
        codes, uniques = pd.factorize(kf[keys[0]], use_na_sentinel=False)
        return codes, [(u,) for u in uniques]
    per = [pd.factorize(kf[k], use_na_sentinel=False) for k in keys]
    # Guard the mixed-radix code space: with many high-cardinality key
    # columns the product of per-batch unique counts can exceed 2^63
    # and wrap, aliasing distinct key tuples into one group. Python-int
    # arithmetic detects it exactly; fall back to a MultiIndex
    # factorize over the per-column codes (no combined code at all).
    radix = 1
    for _, uniques in per:
        radix *= max(len(uniques), 1)
    if radix >= 2 ** 62:
        mi = pd.MultiIndex.from_arrays([codes for codes, _ in per])
        row_codes, mi_uniques = mi.factorize()
        out = [tuple(per[i][1][code_tup[i]] for i in range(len(per)))
               for code_tup in mi_uniques]
        return row_codes, out
    # mixed-radix combine of per-column codes, then one factorize over
    # the combined int codes (null-free by construction)
    combined = np.zeros(len(kf), dtype=np.int64)
    for codes, uniques in per:
        combined *= max(len(uniques), 1)
        combined += codes
    row_codes, row_uniques = pd.factorize(combined)
    out = []
    for cc in row_uniques.tolist():
        vals = []
        for codes, uniques in reversed(per):
            m = max(len(uniques), 1)
            vals.append(uniques[cc % m])
            cc //= m
        out.append(tuple(reversed(vals)))
    return row_codes, out


def _py_key(v):
    """Arrow-safe scalar for a group-key value (NaN/NaT/NA -> None)."""
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    return v.item() if isinstance(v, np.generic) else v


def _state_batch(cols: list[list], out_schema: StructType) -> pa.RecordBatch:
    """Build the (keys..., state, count) output batch. Key columns go
    through a safe cast: an int64 key column that contained nulls
    arrives from pandas as float64, and its non-null uniques must land
    back in the declared integer type."""
    from pyspark.sql.pandas.types import to_arrow_type
    arrays = []
    for i, f in enumerate(out_schema.fields):
        typ = to_arrow_type(f.dataType)
        arr = pa.array(cols[i])
        arrays.append(arr if arr.type == typ else arr.cast(typ))
    return pa.RecordBatch.from_arrays(
        arrays, names=[f.name for f in out_schema.fields])


# ---------------------------------------------------------------------------
# stage 1: per-partition combine
# ---------------------------------------------------------------------------

def sketch_partitions(df: DataFrame, value_col: str, factory: SketchFactory,
                      keys: Sequence[str] = (),
                      min_partitions: int | None = None) -> DataFrame:
    """One sketch state per (input partition x group key).

    Output schema: ``keys..., sketch_state binary, n_values long``.
    The per-element group assignment is fully vectorized:
    ``np.repeat(key_codes, row_lengths)`` + one stable argsort per batch.

    ``min_partitions`` (default: cluster parallelism) guards against
    under-split inputs — a small parquet table may arrive as 1-3
    partitions, which would serialize the combine. The repartition is a
    no-op branch on real at-scale inputs (thousands of partitions).
    """
    keys = list(keys)
    if min_partitions is None:
        min_partitions = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min_partitions:
        df = df.repartition(min_partitions)
    key_fields = [df.schema[k] for k in keys]
    out_schema = StructType(key_fields + [
        StructField(STATE_COL, BinaryType(), False),
        StructField(COUNT_COL, LongType(), False),
    ])

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        if not keys:
            # Global build: coalesce incoming Arrow batches to
            # ~_COALESCE_ELEMS elements per update_batch call. Spark
            # hands mapInArrow maxRecordsPerBatch-sized batches (2048
            # in the bench config) — at 1.2e9 scalar rows that is
            # ~600k update_batch calls whose fixed per-call cost
            # (prepare/hash setup, per-chunk sorts) dominates the
            # kernels. Chunk-size invariance of every sketch is
            # law-tested, so coalescing is observationally neutral.
            sk0: Sketch | None = None
            n0 = 0
            buf: list[np.ndarray] = []
            buf_n = 0

            def flush():
                nonlocal n0, buf, buf_n
                v = buf[0] if len(buf) == 1 else np.concatenate(buf)
                sk0.update_batch(v)
                n0 += len(v)
                buf, buf_n = [], 0

            for batch in batches:
                col = batch.column(batch.schema.get_field_index(value_col))
                values, lengths = _flatten_values(col)
                if len(values) == 0 and (lengths is None
                                         or batch.num_rows == 0):
                    continue
                if sk0 is None:
                    # rows seen (possibly all-empty arrays): a state
                    # row must exist, as before coalescing
                    sk0 = factory()
                if len(values) == 0:
                    continue
                buf.append(values)
                buf_n += len(values)
                if buf_n >= _COALESCE_ELEMS:
                    flush()
            if sk0 is None:
                return
            if buf:
                flush()
            yield _state_batch([[sk0.to_bytes()], [n0]], out_schema)
            return

        # Keyed build with cross-batch coalescing (same rationale as
        # the global path above): Spark hands ~maxRecordsPerBatch-row
        # Arrow batches, so a G-group partition would otherwise call
        # update_batch with ~rows/G elements — at 10k-row batches and
        # a handful of groups that is ~1k-element calls whose fixed
        # cost (compaction, hash setup, per-chunk sorts) dominates the
        # kernels. Values buffer per key and flush at _COALESCE_ELEMS;
        # a global cap bounds worker memory at any key cardinality.
        # Chunk-size invariance of every sketch is law-tested, so
        # coalescing is observationally neutral.
        sketches: dict[tuple, Sketch] = {}
        counts: dict[tuple, int] = {}
        pend: dict[tuple, list[np.ndarray]] = {}
        pend_n: dict[tuple, int] = {}
        total_pend = 0
        _GLOBAL_CAP = 8 * _COALESCE_ELEMS

        def flush(key: tuple) -> None:
            nonlocal total_pend
            bufs = pend.pop(key, None)
            if not bufs:
                return
            v = bufs[0] if len(bufs) == 1 else np.concatenate(bufs)
            sketches[key].update_batch(v)
            counts[key] += len(v)
            total_pend -= pend_n.pop(key)

        for batch in batches:
            col = batch.column(batch.schema.get_field_index(value_col))
            values, lengths = _flatten_values(col)
            if len(values) == 0 and (lengths is None or batch.num_rows == 0):
                continue
            kf = _key_frame(batch, keys)
            codes, uni_tuples = _factorize_rows(kf, keys)
            elem_codes = codes if lengths is None else np.repeat(codes, lengths)
            order = np.argsort(elem_codes, kind="stable")
            sorted_vals = values[order]
            sorted_codes = elem_codes[order]
            bounds = np.searchsorted(sorted_codes, np.arange(len(uni_tuples) + 1))
            groups = [(uni_tuples[c], sorted_vals[bounds[c]:bounds[c + 1]])
                      for c in range(len(uni_tuples))]
            for key, vals in groups:
                if key not in sketches:
                    sketches[key] = factory()
                    counts[key] = 0
                if len(vals):
                    if (len(vals) >= _COALESCE_ELEMS
                            and key not in pend):
                        # already kernel-sized: update zero-copy
                        sketches[key].update_batch(vals)
                        counts[key] += len(vals)
                        continue
                    # .copy(): a slice view would pin the whole
                    # batch array until flush
                    pend.setdefault(key, []).append(vals.copy())
                    pend_n[key] = pend_n.get(key, 0) + len(vals)
                    total_pend += len(vals)
                    if pend_n[key] >= _COALESCE_ELEMS:
                        flush(key)
            if total_pend >= _GLOBAL_CAP:
                for key in list(pend):
                    flush(key)
        for key in list(pend):
            flush(key)
        if not sketches:
            return
        cols: list[list] = [[] for _ in keys] + [[], []]
        for key, sk in sketches.items():
            for i, kv in enumerate(key):
                cols[i].append(_py_key(kv))
            cols[len(keys)].append(sk.to_bytes())
            cols[len(keys) + 1].append(counts[key])
        yield _state_batch(cols, out_schema)

    return df.select(*(keys + [value_col])).mapInArrow(run, out_schema)


# ---------------------------------------------------------------------------
# stage 2: (optionally layered) merge of states by key
# ---------------------------------------------------------------------------

def _merge_fn(keys: Sequence[str]):
    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        states = pdf[STATE_COL].tolist()
        acc = from_bytes(bytes(states[0]))
        for s in states[1:]:
            acc.merge_in_place(from_bytes(bytes(s)))
        row = {k: pdf[k].iloc[0] for k in keys}
        row[STATE_COL] = acc.to_bytes()
        row[COUNT_COL] = int(pdf[COUNT_COL].sum())
        return pd.DataFrame([row])
    return merge


def premerge_local(states_df: DataFrame, keys: Sequence[str] = (),
                   target_partitions: int | None = None) -> DataFrame:
    """Shuffle-free pre-merge of partition states.

    ``coalesce`` (no Exchange) packs many map partitions into
    ``target_partitions`` tasks, and a mapInArrow pass merges states
    per key WITHIN each coalesced partition. At warehouse scale the
    input stage can emit hundreds of thousands of (partition x key)
    state rows; this reduces what the keyed merge shuffle carries from
    P x K rows to target x K without moving a byte across the network.
    Use before merge_sketches when P >> cores (e.g. 800k-partition
    scans); a no-op branch when already at or below the target."""
    parallelism = states_df.sparkSession.sparkContext.defaultParallelism
    if target_partitions is None:
        target_partitions = parallelism
    # Never coalesce below cluster parallelism: coalesce has no shuffle
    # boundary, so the ENTIRE upstream scan+combine would run in
    # target_partitions tasks, idling the rest of the cluster.
    # Measured on the 1.2e9-token rehearsal: target 8 on 32 cores ran
    # 159.9 s vs 59.5 s at target 32 — the 4x shuffle-row saving can
    # never repay a 4x-serialized scan.
    target_partitions = max(target_partitions, parallelism)
    if states_df.rdd.getNumPartitions() <= target_partitions:
        return states_df
    keys = list(keys)
    coalesced = states_df.coalesce(target_partitions)
    out_schema = StructType([states_df.schema[k] for k in keys] + [
        StructField(STATE_COL, BinaryType(), False),
        StructField(COUNT_COL, LongType(), False),
    ])

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        acc: dict[tuple, Sketch] = {}
        counts: dict[tuple, int] = {}
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            key_cols = [tbl.column(k).to_pylist() for k in keys]
            states = tbl.column(STATE_COL).to_pylist()
            ns = tbl.column(COUNT_COL).to_pylist()
            for i, (blob, n) in enumerate(zip(states, ns)):
                key = tuple(col[i] for col in key_cols)
                sk = from_bytes(bytes(blob))
                if key in acc:
                    acc[key].merge_in_place(sk)
                    counts[key] += n
                else:
                    acc[key] = sk
                    counts[key] = n
        if not acc:
            return
        cols: list[list] = [[] for _ in keys] + [[], []]
        for key, sk in acc.items():
            for i, kv in enumerate(key):
                cols[i].append(_py_key(kv))
            cols[len(keys)].append(sk.to_bytes())
            cols[len(keys) + 1].append(counts[key])
        yield _state_batch(cols, out_schema)

    return coalesced.mapInArrow(run, out_schema)


def merge_sketches(states_df: DataFrame, keys: Sequence[str] = (),
                   fanout: int = 0,
                   premerge: int | None = None) -> DataFrame:
    """Merge per-partition states down to one state per key.

    ``fanout > 0`` inserts an intermediate salted round: states first
    merge within ``fanout`` buckets per key, bounding any single
    reducer's fan-in (treeAggregate-style; use when #partitions is
    large or a key is hot). ``premerge`` additionally inserts the
    shuffle-free coalesce-level combine (see premerge_local) BEFORE the
    keyed shuffle — the lever for very high input partition counts."""
    if premerge is not None:
        states_df = premerge_local(states_df, keys, premerge)
    keys = list(keys)
    schema = StructType([states_df.schema[k] for k in keys] + [
        StructField(STATE_COL, BinaryType(), False),
        StructField(COUNT_COL, LongType(), False),
    ])
    if fanout:
        salted = states_df.withColumn(
            "__bucket", F.pmod(F.spark_partition_id(), F.lit(fanout)))
        inter_schema = StructType(
            [states_df.schema[k] for k in keys]
            + [StructField("__bucket", salted.schema["__bucket"].dataType, False),
               StructField(STATE_COL, BinaryType(), False),
               StructField(COUNT_COL, LongType(), False)])
        partial = salted.groupBy(*(keys + ["__bucket"])).applyInPandas(
            _merge_fn(keys + ["__bucket"]), inter_schema)
        states_df = partial.select(*(keys + [STATE_COL, COUNT_COL]))
    if keys:
        return states_df.groupBy(*keys).applyInPandas(_merge_fn(keys), schema)
    # keyless: materialize the grouping column so applyInPandas sees it
    return (states_df.withColumn("__g", F.lit(1))
            .groupBy("__g")
            .applyInPandas(
                _merge_fn(["__g"]),
                StructType([StructField("__g", LongType(), False)]
                           + schema.fields))
            .drop("__g"))


# ---------------------------------------------------------------------------
# top-level entry points (the AlgebirdRDD API analogs)
# ---------------------------------------------------------------------------

def sketch_by_key(df: DataFrame, keys: Sequence[str], value_col: str,
                  factory: SketchFactory, fanout: int = 0,
                  min_partitions: int | None = None,
                  premerge: int | None = None) -> DataFrame:
    """``rdd.algebird.aggregateByKey`` analog: DataFrame of
    ``keys..., sketch_state, n_values`` with one row per key.
    ``premerge``: shuffle-free coalesce-level combine before the keyed
    merge — set to ~cluster cores when the scan has far more
    partitions than executors (see premerge_local)."""
    states = sketch_partitions(df, value_col, factory, keys,
                               min_partitions=min_partitions)
    return merge_sketches(states, keys, fanout=fanout, premerge=premerge)


def sketch_by_key_multi(df: DataFrame, keys: Sequence[str],
                        value_cols: Sequence[str], factory: SketchFactory,
                        fanout: int = 0,
                        min_partitions: int | None = None,
                        premerge: int | None = None) -> DataFrame:
    """Multi-argument variant for sketches whose ``update_batch`` takes
    aligned companion arrays — SketchMap(keys, weights),
    DecayingCMS(keys, timestamps, weights), HLLSeries(values, timestamps),
    ScopedTopN(items, scopes). All ``value_cols`` must be scalar columns;
    each batch calls ``update_batch(col0, col1, ...)`` positionally.
    """
    keys = list(keys)
    value_cols = list(value_cols)
    if min_partitions is None:
        min_partitions = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min_partitions:
        df = df.repartition(min_partitions)
    key_fields = [df.schema[k] for k in keys]
    out_schema = StructType(key_fields + [
        StructField(STATE_COL, BinaryType(), False),
        StructField(COUNT_COL, LongType(), False),
    ])

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        if not keys:
            # Global build: coalesce to ~_COALESCE_ELEMS rows per
            # update_batch call (see sketch_by_key — same rationale;
            # aligned companion arrays are concatenated column-wise).
            sk0: Sketch | None = None
            n0 = 0
            bufs: list[list[np.ndarray]] = [[] for _ in value_cols]
            buf_n = 0

            def flush():
                nonlocal n0, bufs, buf_n
                args = [b[0] if len(b) == 1 else np.concatenate(b)
                        for b in bufs]
                sk0.update_batch(*args)
                n0 += len(args[0])
                bufs, buf_n = [[] for _ in value_cols], 0

            for batch in batches:
                if batch.num_rows == 0:
                    continue
                if sk0 is None:
                    sk0 = factory()
                for i, c in enumerate(value_cols):
                    bufs[i].append(
                        batch.column(batch.schema.get_field_index(c))
                        .to_numpy(zero_copy_only=False))
                buf_n += batch.num_rows
                if buf_n >= _COALESCE_ELEMS:
                    flush()
            if sk0 is None:
                return
            if buf_n:
                flush()
            yield _state_batch([[sk0.to_bytes()], [n0]], out_schema)
            return

        # keyed build with the same cross-batch coalescing as
        # sketch_by_key: buffer each key's aligned column slices and
        # flush at _COALESCE_ELEMS rows (fancy-indexed slices are
        # already copies, so no .copy() needed here)
        sketches: dict[tuple, Sketch] = {}
        counts: dict[tuple, int] = {}
        pend: dict[tuple, list[tuple]] = {}
        pend_n: dict[tuple, int] = {}
        total_pend = 0
        _GLOBAL_CAP = 8 * _COALESCE_ELEMS

        def flush_key(key: tuple) -> None:
            nonlocal total_pend
            slices = pend.pop(key, None)
            if not slices:
                return
            args = [slices[0][i] if len(slices) == 1
                    else np.concatenate([s[i] for s in slices])
                    for i in range(len(value_cols))]
            sketches[key].update_batch(*args)
            counts[key] += len(args[0])
            total_pend -= pend_n.pop(key)

        for batch in batches:
            if batch.num_rows == 0:
                continue
            cols = [batch.column(batch.schema.get_field_index(c))
                    .to_numpy(zero_copy_only=False) for c in value_cols]
            kf = _key_frame(batch, keys)
            codes, uni = _factorize_rows(kf, keys)
            order = np.argsort(codes, kind="stable")
            bounds = np.searchsorted(codes[order], np.arange(len(uni) + 1))
            groups = [(uni[c], order[bounds[c]:bounds[c + 1]])
                      for c in range(len(uni))]
            for key, idx in groups:
                if key not in sketches:
                    sketches[key] = factory()
                    counts[key] = 0
                if not len(idx):
                    continue
                if len(idx) >= _COALESCE_ELEMS and key not in pend:
                    sketches[key].update_batch(*(c[idx] for c in cols))
                    counts[key] += len(idx)
                    continue
                pend.setdefault(key, []).append(
                    tuple(c[idx] for c in cols))
                pend_n[key] = pend_n.get(key, 0) + len(idx)
                total_pend += len(idx)
                if pend_n[key] >= _COALESCE_ELEMS:
                    flush_key(key)
            if total_pend >= _GLOBAL_CAP:
                for key in list(pend):
                    flush_key(key)
        for key in list(pend):
            flush_key(key)
        if not sketches:
            return
        out_cols: list[list] = [[] for _ in keys] + [[], []]
        for key, sk in sketches.items():
            for i, kv in enumerate(key):
                out_cols[i].append(_py_key(kv))
            out_cols[len(keys)].append(sk.to_bytes())
            out_cols[len(keys) + 1].append(counts[key])
        yield _state_batch(out_cols, out_schema)

    states = df.select(*(keys + value_cols)).mapInArrow(run, out_schema)
    return merge_sketches(states, keys, fanout=fanout, premerge=premerge)


def sketch_global(df: DataFrame, value_col: str, factory: SketchFactory,
                  fanout: int = 32) -> Sketch:
    """``rdd.algebird.aggregate`` analog: one sketch for the whole frame.

    Partition states partial-merge into ``fanout`` buckets in parallel;
    the driver folds only the <= fanout survivors (treeAggregate tail).
    """
    states = sketch_partitions(df, value_col, factory)
    bucketed = states.withColumn(
        "__bucket", F.pmod(F.spark_partition_id(), F.lit(fanout)))
    inter_schema = StructType([
        StructField("__bucket", bucketed.schema["__bucket"].dataType, False),
        StructField(STATE_COL, BinaryType(), False),
        StructField(COUNT_COL, LongType(), False)])
    partial = bucketed.groupBy("__bucket").applyInPandas(
        _merge_fn(["__bucket"]), inter_schema)
    rows = partial.select(STATE_COL).collect()
    if not rows:
        return factory()  # monoid zero on empty input
    acc = from_bytes(bytes(rows[0][0]))
    for r in rows[1:]:
        acc.merge_in_place(from_bytes(bytes(r[0])))
    return acc


def sketch_rollup(df: DataFrame, keys: Sequence[str], value_col: str,
                  factory: SketchFactory, grouping: str = "rollup",
                  fanout: int = 0, premerge: int | None = None,
                  cache: bool = True,
                  sets: Sequence[Sequence[str]] | None = None) -> DataFrame:
    """Every ROLLUP / CUBE grouping level from ONE scan of the input:
    build sketch states at the finest key grain (``sketch_by_key``),
    then derive each coarser level by MERGING the finest states —
    the associativity the reference's Monoid laws guarantee
    (algebird-core .../Monoid.scala:41-76; the rollup/cube macros in
    MapAlgebra.scala:274-318 recompute each level from rows — states
    make the levels free). At warehouse scale this is the difference
    between one pass over the corpus and ``levels`` passes: the coarse
    levels merge the (tiny, one-row-per-fine-key) state table, never
    the raw rows.

    Returns ``keys..., grouping_id, sketch_state, n_values`` with SQL
    grouping semantics: a key column is NULL on levels that rolled it
    up, and ``grouping_id`` is Spark's ``F.grouping_id()`` bitmask
    (first key = most significant bit; DuckDB's ``GROUPING(k1, k2)``
    matches) — it disambiguates genuinely-NULL key values from
    rolled-up ones. ``grouping='rollup'`` emits the ``d+1`` prefix
    levels; ``'cube'`` all ``2^d`` subsets; ``sets=[...]`` names
    explicit GROUPING SETS (each a subset of ``keys``; SQL semantics —
    order preserved, duplicate sets emit duplicate level rows) and
    overrides ``grouping``.

    Plan shape (round 7): the finest states EXPLODE into one
    (grouping_id, masked-keys) row per level and all levels merge in a
    single keyed shuffle + single applyInPandas stage — stage count
    independent of the level count, no intermediate persist. Explicit
    duplicate GROUPING SETS (SQL emits duplicate level rows; a keyed
    merge would fold them) fall back to a per-level merge loop, where
    the finest state table persists under the operator-scoped cache
    (``cache=False`` opts out — the plan then rescans the input once
    per level)."""
    keys = list(keys)
    if not keys:
        raise ValueError("sketch_rollup needs at least one key; use "
                         "sketch_global for the single keyless state")
    if grouping not in ("rollup", "cube"):
        raise ValueError("grouping must be 'rollup' or 'cube'")
    # r8 single-merge fusion: rollup_levels works on ANY
    # (keys, state, count) table, so when the (partition-state rows x
    # levels) explode stays small, feed it the PARTITION states
    # directly — every level then merges in the one keyed shuffle +
    # one applyInPandas stage and the intermediate finest-grain merge
    # stage disappears (measured: hll_rollup_sketch 2.4 -> 1.9 s at
    # sf1.0). Monoid associativity makes the result the same merge of
    # the same partition states, just in one round. At warehouse
    # scale (many scan partitions) the explode would multiply the
    # state shuffle by the level count, so the two-stage plan stays
    # the default there; explicit duplicate GROUPING SETS also keep
    # it (rollup_levels' keyed merge would fold them).
    if sets is not None:
        n_levels = len(list(sets))
        dup_sets = len({frozenset(s) for s in sets}) != n_levels
    else:
        n_levels = (len(keys) + 1 if grouping == "rollup"
                    else 2 ** len(keys))
        dup_sets = False
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    n_parts = max(df.rdd.getNumPartitions(), parallelism)
    if not dup_sets and n_parts * n_levels <= 16_384:
        states = sketch_partitions(df, value_col, factory, keys)
        return rollup_levels(states, keys, factory, grouping=grouping,
                             sets=sets, cache=cache)
    fine = sketch_by_key(df, keys, value_col, factory,
                         fanout=fanout, premerge=premerge)
    return rollup_levels(fine, keys, factory, grouping=grouping,
                         sets=sets, cache=cache)


def rollup_levels(fine: DataFrame, keys: Sequence[str],
                  factory: SketchFactory, grouping: str = "rollup",
                  sets: Sequence[Sequence[str]] | None = None,
                  cache: bool = True) -> DataFrame:
    """Derive every grouping level from an EXISTING finest-grain state
    table ``(keys..., sketch_state, n_values)`` — the second half of
    ``sketch_rollup``, split out so persisted/checkpointed states can
    feed it directly (``sources.checkpoint.rollup_or_resume``): at
    warehouse scale the cube refreshes by re-deriving levels from the
    maintained state table, never rescanning the corpus. Semantics and
    output schema exactly as ``sketch_rollup``."""
    keys = list(keys)
    if grouping not in ("rollup", "cube"):
        raise ValueError("grouping must be 'rollup' or 'cube'")
    if sets is not None and len(list(sets)) == 0:
        raise ValueError("sets must name at least one grouping set "
                         "(use [[]] for just the grand total)")
    d = len(keys)
    if sets is not None:
        idx = {k: i for i, k in enumerate(keys)}
        subsets = []
        for s in sets:
            unknown = [k for k in s if k not in idx]
            if unknown:
                raise ValueError(
                    f"grouping set column(s) {unknown} not in keys {keys}")
            subsets.append(frozenset(idx[k] for k in s))
    elif grouping == "rollup":
        subsets = [frozenset(range(i)) for i in range(d, -1, -1)]
    else:
        subsets = [frozenset(j for j in range(d) if (m >> (d - 1 - j)) & 1 == 0)
                   for m in range(2 ** d)]
    key_types = {k: fine.schema[k].dataType for k in keys}

    if len(set(subsets)) == len(subsets):
        # Single-pass plan (round 7): explode each finest-grain state
        # row into one (grouping_id, masked keys) struct PER LEVEL,
        # then merge every level in ONE keyed shuffle + ONE
        # applyInPandas stage. The per-level loop below runs a
        # separate merge job per level (a d-key CUBE = 2^d Exchanges
        # and 2^d Python stages) and must persist the fine table to
        # avoid rescanning the corpus per level; the explode ships the
        # same total state volume through a single Exchange, needs no
        # cache, and its stage count is independent of the level
        # count. Only explicit duplicate GROUPING SETS (which SQL says
        # emit duplicate rows — a keyed merge would fold them into
        # one doubly-merged row) take the legacy loop.
        structs = []
        for sub in subsets:
            gid = sum(1 << (d - 1 - i) for i in range(d) if i not in sub)
            fields = [(F.col(k) if i in sub
                       else F.lit(None).cast(key_types[k])).alias(k)
                      for i, k in enumerate(keys)]
            structs.append(F.struct(
                F.lit(gid).cast("long").alias("grouping_id"), *fields))
        flat = (fine.select(F.explode(F.array(*structs)).alias("__lvl"),
                            STATE_COL, COUNT_COL)
                .select("__lvl.*", STATE_COL, COUNT_COL))
        if frozenset() in subsets:
            # SQL parity: the () grouping set emits its row even on
            # empty input; folding one monoid-zero state into the
            # grand-total group is free on non-empty input (identity
            # law) and supplies that row on empty.
            zero = fine.sparkSession.createDataFrame(
                [((2 ** d) - 1,) + (None,) * d
                 + (bytearray(factory().to_bytes()), 0)], flat.schema)
            flat = flat.unionByName(zero)
        merged = merge_sketches(flat, ["grouping_id"] + keys)
        return merged.select(*keys, "grouping_id", STATE_COL, COUNT_COL)

    if cache:
        from .operators.dedup import _cache_scoped, _new_generation
        fine = _cache_scoped("sketch_rollup_fine", fine,
                             gen=_new_generation())
    out = None
    for sub in subsets:
        kept = [keys[i] for i in range(d) if i in sub]
        gid = sum(1 << (d - 1 - i) for i in range(d) if i not in sub)
        if len(kept) == d:
            lvl = fine
        elif kept:
            lvl = merge_sketches(fine, kept)
        else:
            # SQL parity: the () grouping set emits its row even on
            # empty input (like SELECT agg FROM empty). Folding in one
            # monoid-zero state costs nothing on non-empty input
            # (identity law) and supplies that row on empty.
            zero = fine.sparkSession.createDataFrame(
                [(bytearray(factory().to_bytes()), 0)],
                StructType([StructField(STATE_COL, BinaryType(), False),
                            StructField(COUNT_COL, LongType(), False)]))
            lvl = merge_sketches(
                fine.select(STATE_COL, COUNT_COL).unionByName(zero), [])
        sel = [(F.col(k) if i in sub
                else F.lit(None).cast(key_types[k])).alias(k)
               for i, k in enumerate(keys)]
        lvl = lvl.select(*sel, F.lit(gid).cast("long").alias("grouping_id"),
                         STATE_COL, COUNT_COL)
        out = lvl if out is None else out.unionByName(lvl)
    return out


# ---------------------------------------------------------------------------
# present: decode final states into estimate columns
# ---------------------------------------------------------------------------

def with_presented(states_df: DataFrame, presenter: Callable[[Sketch], dict],
                   out_fields: str) -> DataFrame:
    """Apply ``presenter(sketch) -> dict`` to each final state row.

    ``out_fields`` is a DDL string for the presented columns, e.g.
    ``"estimate double, low double, high double"``. Runs driver-free via
    mapInPandas; final states are one row per group, so this is cheap.
    """
    in_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                          for f in states_df.schema.fields
                          if f.name != STATE_COL)
    schema = f"{in_fields}, {out_fields}"

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            presented = [presenter(from_bytes(bytes(b))) for b in pdf[STATE_COL]]
            out = pdf.drop(columns=[STATE_COL]).reset_index(drop=True)
            yield pd.concat([out, pd.DataFrame(presented)], axis=1)

    return states_df.mapInPandas(run, schema)


def present_explode(states_df: DataFrame,
                    presenter: Callable[[Sketch], list[dict]],
                    out_fields: str) -> DataFrame:
    """Like ``with_presented`` but ``presenter(sketch) -> list[dict]``:
    zero or more output rows per final state (e.g. top-N per scope from
    a ScopedTopN state). Group-key columns are carried onto every
    emitted row; ``out_fields`` is a DDL string for the presented
    columns. Runs in-plan via mapInPandas — final states are one row
    per group, so this is cheap and never touches the driver."""
    key_cols = [f.name for f in states_df.schema.fields
                if f.name not in (STATE_COL, COUNT_COL)]
    key_ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                        for f in states_df.schema.fields
                        if f.name in key_cols)
    schema = f"{key_ddl}, {out_fields}" if key_ddl else out_fields

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: list[dict] = []
            for i in range(len(pdf)):
                for d in presenter(from_bytes(bytes(pdf[STATE_COL].iloc[i]))):
                    row = {k: pdf[k].iloc[i] for k in key_cols}
                    row.update(d)
                    rows.append(row)
            if rows:
                yield pd.DataFrame(rows)

    return states_df.mapInPandas(run, schema)
