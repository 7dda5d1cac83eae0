"""End-to-end Spark harness tests: partition-combine topology, tree merge,
by-key sketches vs exact Spark oracles, partition-reorder invariance,
token-table generator invariants."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from algebird_spark.agg import (STATE_COL, sketch_by_key, sketch_global,
                                with_presented)
from algebird_spark.sketches import CMS, HLL, KLL, from_bytes
from algebird_spark.sources.datagen import token_table


@pytest.fixture(scope="module")
def tokens(spark):
    df = token_table(spark, rows=2_000, n_sources=4, vocab=50_000,
                     median_n_tok=64, seed=42, partitions=8)
    df.cache().count()
    return df


def test_datagen_deterministic_and_invariants(spark, tokens):
    again = token_table(spark, rows=2_000, n_sources=4, vocab=50_000,
                        median_n_tok=64, seed=42, partitions=3)  # different partitioning
    a = tokens.orderBy("doc_id").limit(50).collect()
    b = again.orderBy("doc_id").limit(50).collect()
    assert [r.doc_id for r in a] == [r.doc_id for r in b]
    assert [r.tokens for r in a] == [r.tokens for r in b]  # token-array equality
    bad = tokens.filter(F.size("tokens") != F.col("n_tok")).count()
    assert bad == 0
    assert tokens.count() == 2_000
    # source skew: top source should dominate (Zipf 1.2)
    shares = dict(tokens.groupBy("source").count().collect())
    top = max(shares.values()) / 2_000
    assert top > 0.3


def test_hll_by_key_vs_exact(spark, tokens):
    states = sketch_by_key(tokens, ["source"], "tokens", lambda: HLL(p=12))
    got = {r["source"]: from_bytes(bytes(r[STATE_COL])).estimate()
           for r in states.collect()}
    exact = {r["source"]: r["d"] for r in
             tokens.select("source", F.explode("tokens").alias("t"))
                   .groupBy("source").agg(F.countDistinct("t").alias("d")).collect()}
    assert set(got) == set(exact)
    for s, est in got.items():
        rel = abs(est - exact[s]) / exact[s]
        assert rel <= 3.5 * 1.04 / np.sqrt(2**12), (s, est, exact[s])


def test_hll_partition_reorder_byte_equal(spark, tokens):
    a = sketch_by_key(tokens, ["source"], "tokens", lambda: HLL(p=12))
    b = sketch_by_key(tokens.repartition(13), ["source"], "tokens",
                      lambda: HLL(p=12))
    sa = {r["source"]: bytes(r[STATE_COL]) for r in a.collect()}
    sb = {r["source"]: bytes(r[STATE_COL]) for r in b.collect()}
    # HLL register-max is idempotent => identical final states
    for s in sa:
        assert from_bytes(sa[s]).estimate() == from_bytes(sb[s]).estimate()


def test_global_sketch_and_fanout(spark, tokens):
    h = sketch_global(tokens, "tokens", lambda: HLL(p=12), fanout=4)
    exact = tokens.select(F.explode("tokens").alias("t")) \
                  .agg(F.countDistinct("t")).collect()[0][0]
    assert abs(h.estimate() - exact) / exact <= 3.5 * 1.04 / np.sqrt(2**12)


def test_cms_by_key_totals_and_guarantee(spark, tokens):
    eps = 0.005
    states = sketch_by_key(tokens, ["source"], "tokens",
                           lambda: CMS(eps=eps, delta=1e-4), fanout=2)
    rows = states.collect()
    exact_tot = {r["source"]: r["n"] for r in
                 tokens.select("source", F.explode("tokens").alias("t"))
                       .groupBy("source").agg(F.count("t").alias("n")).collect()}
    exact_top = {r["source"]: (r["t"], r["c"]) for r in
                 spark.sql("""
        SELECT source, t, c FROM (
          SELECT source, t, count(*) c,
                 row_number() OVER (PARTITION BY source ORDER BY count(*) DESC, t) rn
          FROM (SELECT source, explode(tokens) t FROM {df})
          GROUP BY source, t) WHERE rn = 1""", df=tokens).collect()}
    for r in rows:
        sk = from_bytes(bytes(r[STATE_COL]))
        assert sk.total == exact_tot[r["source"]]
        tok, cnt = exact_top[r["source"]]
        est = sk.frequency(tok).estimate
        assert cnt <= est <= cnt + eps * sk.total


def test_kll_by_key_scalar_column(spark, tokens):
    states = sketch_by_key(tokens, ["source"], "n_tok", lambda: KLL(k=200))
    exact = {r["source"]: r["m"] for r in
             tokens.groupBy("source").agg(
                 F.expr("percentile(n_tok, 0.5)").alias("m")).collect()}
    for r in states.collect():
        sk = from_bytes(bytes(r[STATE_COL]))
        lo, hi = sk.quantile_bounds(0.5)
        assert lo <= exact[r["source"]] <= hi


def test_with_presented(spark, tokens):
    states = sketch_by_key(tokens, ["source"], "tokens", lambda: HLL(p=12))
    out = with_presented(states, lambda sk: {"estimate": sk.estimate()},
                         "estimate double")
    rows = out.collect()
    assert {r["source"] for r in rows} == {f"src_{i:02d}" for i in range(4)}
    assert all(r["estimate"] > 0 for r in rows)
    assert "estimate" in out.columns and STATE_COL not in out.columns


def test_empty_input(spark):
    empty = spark.range(0).selectExpr("cast(id as int) x",
                                      "array(cast(id as int)) tokens",
                                      "string(id) source")
    h = sketch_global(empty, "tokens", lambda: HLL(p=10))
    assert h.estimate() == 0.0
    states = sketch_by_key(empty, ["source"], "tokens", lambda: HLL(p=10))
    assert states.count() == 0


def test_null_handling_matches_sql_semantics(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("b", 2), ("b", 2), ("a", 3), ("b", None)],
        "k string, v int")
    states = sketch_by_key(df, ["k"], "v", lambda: HLL(p=10))
    got = {r["k"]: round(from_bytes(bytes(r[STATE_COL])).estimate())
           for r in states.collect()}
    exact = {r[0]: r[1] for r in
             df.groupBy("k").agg(F.count_distinct("v")).collect()}
    assert got == exact  # nulls ignored like count_distinct

    arr = spark.createDataFrame(
        [("a", [1, None, 2]), ("b", [2, 2]), ("a", None), ("b", [3])],
        "k string, v array<int>")
    states = sketch_by_key(arr, ["k"], "v", lambda: HLL(p=10))
    got = {r["k"]: round(from_bytes(bytes(r[STATE_COL])).estimate())
           for r in states.collect()}
    assert got == {"a": 2, "b": 2}


def test_multi_column_harness_sketchmap_and_hllseries(spark):
    from algebird_spark.agg import sketch_by_key_multi
    from algebird_spark.sketches import SketchMap
    from algebird_spark.sketches.timeseries import HLLSeries
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

    # SketchMap(keys, weights): total quantity per suppkey, per returnflag
    states = sketch_by_key_multi(
        li, ["l_returnflag"], ["l_suppkey", "l_quantity"],
        lambda: SketchMap(eps=0.001, delta=1e-4, heavy_hitters_count=3))
    exact = {(r[0], r[1]): r[2] for r in
             li.groupBy("l_returnflag", "l_suppkey")
               .agg(F.sum("l_quantity")).collect()}
    for r in states.collect():
        sk = from_bytes(bytes(r[STATE_COL]))
        flag = r["l_returnflag"]
        keys = np.array(sorted(k for f, k in exact if f == flag), dtype=np.int64)
        est = sk.values(keys)
        truth = np.array([exact[(flag, int(k))] for k in keys])
        assert (est >= truth - 1e-9).all()
        assert (est <= truth + sk.eps * sk.total + 1e-9).all()

    # HLLSeries(values, timestamps): distinct users since mid-time
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .withColumn("sec", F.col("ts").cast("timestamp").cast("double"))
    states = sketch_by_key_multi(ev, [], ["user_id", "sec"],
                                 lambda: HLLSeries(p=12))
    sk = from_bytes(bytes(states.collect()[0][STATE_COL]))
    lo, hi = ev.agg(F.min("sec"), F.max("sec")).collect()[0]
    mid = (lo + hi) / 2
    exact_recent = ev.filter(F.col("sec") >= mid) \
        .agg(F.count_distinct("user_id")).collect()[0][0]
    est = sk.since(mid).estimate()
    assert abs(est - exact_recent) / exact_recent <= 3.5 * 1.04 / np.sqrt(2**12)


def test_premerge_local_shuffle_free_and_equivalent(spark, tokens):
    """premerge_local packs partition states without an Exchange and
    the final estimates are identical to the direct merge path."""
    import io
    from contextlib import redirect_stdout
    from algebird_spark.agg import merge_sketches, premerge_local, sketch_partitions

    states = sketch_partitions(tokens.repartition(16), "tokens",
                               lambda: HLL(p=12), ["source"])
    pre = premerge_local(states, ["source"], target_partitions=4)
    # no Exchange between the two mapInArrow stages (coalesce only)
    buf = io.StringIO()
    with redirect_stdout(buf):
        pre.explain("formatted")
    plan = buf.getvalue().split("\n\n")[0]
    first_map = plan.index("MapInArrow")
    assert "Exchange" not in plan[:first_map], "premerge must not shuffle"
    direct = merge_sketches(states, ["source"])
    via_pre = merge_sketches(pre, ["source"])
    a = {r["source"]: (from_bytes(bytes(r[STATE_COL])).estimate(), r["n_values"])
         for r in direct.collect()}
    b = {r["source"]: (from_bytes(bytes(r[STATE_COL])).estimate(), r["n_values"])
         for r in via_pre.collect()}
    assert a == b
    # end-to-end through the entry point
    c = {r["source"]: (from_bytes(bytes(r[STATE_COL])).estimate(), r["n_values"])
         for r in sketch_by_key(tokens, ["source"], "tokens",
                                lambda: HLL(p=12), premerge=4).collect()}
    assert c == a


def test_keyed_coalescing_invariant_under_tiny_arrow_batches(spark):
    """Round-6 regression pin for the keyed cross-batch buffering in
    sketch_partitions / sketch_by_key_multi: with Arrow batches forced
    down to 64 rows the kernels see hundreds of per-(batch, group)
    slices, exercising the per-key buffers, the direct zero-copy path,
    the global cap flush, and the end-of-stream flush — all of which
    must be observationally invisible. HLL is byte-canonical so states
    must be BYTE-equal; SpaceSaver (order-sensitive eviction) must see
    the identical per-key element sequence, so its exact-mode counts
    must match too."""
    from algebird_spark.operators.exact import top_k_per_group  # noqa: F401
    from algebird_spark.sketches import HLL, SpaceSaver

    df = (spark.range(30_000)
          .select((F.col("id") % 5).cast("string").alias("g"),
                  (F.col("id") * 2654435761 % 997).alias("v"))
          .repartition(4, "g"))
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        def states(factory):
            out = {}
            for r in sketch_by_key(df, ["g"], "v", factory).collect():
                out[r["g"]] = bytes(r[STATE_COL])
            return out

        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
        tiny_hll = states(lambda: HLL(p=12))
        tiny_ss = {g: from_bytes(b).counters
                   for g, b in states(lambda: SpaceSaver(capacity=64)).items()}
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                       "100000")
        big_hll = states(lambda: HLL(p=12))
        big_ss = {g: from_bytes(b).counters
                  for g, b in states(lambda: SpaceSaver(capacity=64)).items()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    assert tiny_hll == big_hll
    assert tiny_ss == big_ss


# ---------------------------------------------------------------------------
# sketch_rollup: every grouping level from one scan, coarse = state merges
# ---------------------------------------------------------------------------

def _rollup_ests(levels_df):
    """{(key values..., grouping_id): estimate} for an HLL rollup frame."""
    out = {}
    for r in levels_df.collect():
        sk = from_bytes(bytes(r[STATE_COL]))
        out[tuple(r[k] for k in levels_df.columns
                  if k not in (STATE_COL, "n_values"))] = sk.estimate()
    return out


def test_rollup_levels_equal_direct_builds(spark, tokens):
    """Merged-state levels must EXACTLY equal building each level
    directly from rows — HLL register-max is associative, so the
    rollup's reaggregation loses nothing."""
    from algebird_spark.agg import sketch_rollup
    df = tokens.withColumn("par", (F.crc32(F.col("doc_id")) % 2).cast("string"))
    got = _rollup_ests(sketch_rollup(df, ["source", "par"], "tokens",
                                     lambda: HLL(p=12)))
    # finest level (gid 0) vs direct two-key build
    direct = {(r["source"], r["par"]): from_bytes(bytes(r[STATE_COL])).estimate()
              for r in sketch_by_key(df, ["source", "par"], "tokens",
                                     lambda: HLL(p=12)).collect()}
    for (s, p), est in direct.items():
        assert got[(s, p, 0)] == est
    # middle level (gid 1: par rolled up) vs direct one-key build
    direct1 = {r["source"]: from_bytes(bytes(r[STATE_COL])).estimate()
               for r in sketch_by_key(df, ["source"], "tokens",
                                      lambda: HLL(p=12)).collect()}
    for s, est in direct1.items():
        assert got[(s, None, 1)] == est
    # grand total (gid 3) vs global build
    assert got[(None, None, 3)] == sketch_global(
        df, "tokens", lambda: HLL(p=12)).estimate()


def test_cube_emits_all_subsets(spark, tokens):
    from algebird_spark.agg import sketch_rollup
    df = tokens.withColumn("par", (F.crc32(F.col("doc_id")) % 2).cast("string"))
    levels = sketch_rollup(df, ["source", "par"], "tokens",
                           lambda: HLL(p=10), grouping="cube")
    gids = {r["grouping_id"] for r in levels.select("grouping_id").collect()}
    assert gids == {0, 1, 2, 3}
    # gid 2 (source rolled up, par kept) exists only in the cube
    roll = sketch_rollup(df, ["source", "par"], "tokens",
                         lambda: HLL(p=10))
    rgids = {r["grouping_id"] for r in roll.select("grouping_id").collect()}
    assert rgids == {0, 1, 3}


def test_rollup_null_key_disambiguated_by_grouping_id(spark):
    """A genuinely-NULL key value at the finest level must not collide
    with the rolled-up NULL: grouping_id separates them, and the
    rolled-up state is the union across all key values incl. NULL."""
    from algebird_spark.agg import sketch_rollup
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), (None, 2), (None, 3)], "k string, v long")
    got = _rollup_ests(sketch_rollup(df, ["k"], "v", lambda: HLL(p=12)))
    assert round(got[("a", 0)]) == 2
    assert round(got[(None, 0)]) == 2   # the real-NULL group
    assert round(got[(None, 1)]) == 3   # the grand total: {1,2,3}


def test_rollup_empty_input_emits_grand_total(spark):
    """SQL parity: GROUP BY ROLLUP on an empty table still emits the
    () grouping set's row (DuckDB/Spark agree) — the keyless level
    folds in a monoid-zero state, which the identity law makes free on
    non-empty input."""
    from algebird_spark.agg import sketch_rollup
    df = spark.createDataFrame([], "k string, v long")
    rows = sketch_rollup(df, ["k"], "v", lambda: HLL(p=12)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["k"] is None and r["grouping_id"] == 1 and r["n_values"] == 0
    assert from_bytes(bytes(r[STATE_COL])).estimate() == 0.0


def test_rollup_rejects_bad_args(spark, tokens):
    from algebird_spark.agg import sketch_rollup
    with pytest.raises(ValueError):
        sketch_rollup(tokens, [], "tokens", lambda: HLL(p=10))
    with pytest.raises(ValueError):
        sketch_rollup(tokens, ["source"], "tokens", lambda: HLL(p=10),
                      grouping="sets")
    with pytest.raises(ValueError):
        sketch_rollup(tokens, ["source"], "tokens", lambda: HLL(p=10),
                      sets=[["nope"]])
    with pytest.raises(ValueError):
        sketch_rollup(tokens, ["source"], "tokens", lambda: HLL(p=10),
                      sets=[])


def test_grouping_sets_levels_equal_direct_builds(spark, tokens):
    """Explicit GROUPING SETS: each named set must equal the direct
    single-set build, with SQL grouping_id (first key = MSB) and no
    extra levels emitted."""
    from algebird_spark.agg import sketch_rollup
    df = tokens.withColumn("par", (F.crc32(F.col("doc_id")) % 2).cast("string"))
    got = _rollup_ests(sketch_rollup(
        df, ["source", "par"], "tokens", lambda: HLL(p=12),
        sets=[["par"], ["source"], []]))
    assert {k[-1] for k in got} == {2, 1, 3}
    # gid 2: source rolled up, par kept — vs direct by-par build
    direct_par = {r["par"]: from_bytes(bytes(r[STATE_COL])).estimate()
                  for r in sketch_by_key(df, ["par"], "tokens",
                                         lambda: HLL(p=12)).collect()}
    for p, est in direct_par.items():
        assert got[(None, p, 2)] == est
    # gid 1: par rolled up — vs direct by-source build
    direct_src = {r["source"]: from_bytes(bytes(r[STATE_COL])).estimate()
                  for r in sketch_by_key(df, ["source"], "tokens",
                                         lambda: HLL(p=12)).collect()}
    for s, est in direct_src.items():
        assert got[(s, None, 1)] == est
    # gid 3: the () set — vs the global build
    assert got[(None, None, 3)] == sketch_global(
        df, "tokens", lambda: HLL(p=12)).estimate()


def test_duplicate_grouping_sets_emit_duplicate_rows(spark, tokens):
    """SQL semantics: duplicate GROUPING SETS emit duplicate level
    rows with IDENTICAL (not doubly-merged) states — this exercises
    the per-level fallback path, since the single-pass explode plan
    would fold the duplicates into one group."""
    from algebird_spark.agg import sketch_rollup
    dup = sketch_rollup(tokens, ["source"], "tokens", lambda: HLL(p=12),
                        sets=[["source"], ["source"]]).collect()
    single = sketch_rollup(tokens, ["source"], "tokens", lambda: HLL(p=12),
                           sets=[["source"]]).collect()
    assert len(dup) == 2 * len(single)
    ests = {}
    for r in dup:
        key = (r["source"], r["grouping_id"])
        ests.setdefault(key, []).append(
            (from_bytes(bytes(r[STATE_COL])).estimate(), r["n_values"]))
    for key, pair in ests.items():
        assert len(pair) == 2 and pair[0] == pair[1], key
    direct = {(r["source"], r["grouping_id"]):
              (from_bytes(bytes(r[STATE_COL])).estimate(), r["n_values"])
              for r in single}
    for key, pair in ests.items():
        assert pair[0] == direct[key], key


def test_rollup_generic_over_cms(spark, tokens):
    """rollup_levels is sketch-generic: with CMS states the per-level
    TOTALS (which CMS tracks exactly) must equal the exact rollup
    counts — same monoid merge path as HLL/KLL/SpaceSaver."""
    from algebird_spark.agg import sketch_rollup
    levels = sketch_rollup(tokens, ["source"], "tokens",
                           lambda: CMS(eps=0.01, delta=1e-4))
    got = {(r["source"], r["grouping_id"]):
           from_bytes(bytes(r[STATE_COL])).total
           for r in levels.collect()}
    exact = {r["source"]: r["n"] for r in
             tokens.select("source", F.explode("tokens").alias("t"))
             .groupBy("source").agg(F.count("t").alias("n")).collect()}
    for s, n in exact.items():
        assert got[(s, 0)] == n
    assert got[(None, 1)] == sum(exact.values())
