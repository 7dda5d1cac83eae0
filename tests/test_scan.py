"""Scan combinator surface (Scan.scala:18-328): running folds, map,
join/zip, joinWithIndex, composition, and the one-Exchange plan."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Row, functions as F

from algebird_spark.operators.scan import Scan


@pytest.fixture(scope="module")
def df(spark):
    rows = [Row(k="a", t=i, v=float(x)) for i, x in
            enumerate([3, -1, 4, -1, 5, -9, 2, 6])]
    rows += [Row(k="b", t=i, v=float(x)) for i, x in enumerate([10, -20, 30])]
    return spark.createDataFrame(rows).repartition(4)


def _pdf(out):
    return (out.toPandas().sort_values(["k", "t"]).reset_index(drop=True))


def test_running_sum_matches_pandas(df):
    got = _pdf(Scan.sum("v", "rs").apply(df, ["k"], "t"))
    want = got.groupby("k")["v"].cumsum()
    assert np.allclose(got["rs"], want)


def test_map_and_then_agg_compose(df):
    # running max OF the running sum, then presented via abs
    scan = Scan.sum("v", "rs").then_agg(F.max, "peak").map(F.abs, "peak_abs")
    got = _pdf(scan.apply(df, ["k"], "t"))
    cs = got.groupby("k")["v"].cumsum()
    peak = cs.groupby(got["k"]).cummax()
    assert np.allclose(got["rs"], cs)
    assert np.allclose(got["peak_abs"], peak.abs())


def test_join_and_index(df):
    scan = (Scan.sum("v", "rs").join(Scan.min("v", "rm"))
            .join_with_index("i"))
    got = _pdf(scan.apply(df, ["k"], "t"))
    assert np.allclose(got["rm"], got.groupby("k")["v"].cummin())
    assert (got["i"] == got.groupby("k").cumcount()).all()


def test_zip_is_join(df):
    a = _pdf(Scan.sum("v").zip(Scan.count()).apply(df, ["k"], "t"))
    b = _pdf(Scan.sum("v").join(Scan.count()).apply(df, ["k"], "t"))
    pd.testing.assert_frame_equal(a, b)


def test_composition_plans_one_exchange(df):
    scan = (Scan.sum("v", "rs").then_agg(F.max, "peak")
            .join_with_index("i"))
    plan = scan.apply(df, ["k"], "t")._jdf.queryExecution() \
        .executedPlan().toString()
    # one hash Exchange + one Sort feed ALL chained Window operators
    # (the RoundRobin exchange is the fixture's own repartition(4))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Sort ") == 1, plan
    assert plan.count("Window ") >= 2, plan


def test_multi_output_combinator_guard(df):
    with pytest.raises(ValueError):
        Scan.sum("v").join(Scan.count()).then_agg(F.max)


# --------------------------------------------------- general Scan.from (r5)
def _session_step(gap):
    def step(state, row):
        prev_ts, sess = state
        new = prev_ts is None or (row.ts - prev_ts) > gap
        sess = sess + 1 if new else sess
        return (row.ts, sess), sess
    return step


def test_from_fn_matches_python_reference_fold(spark):
    """Law: GeneralScan.apply == a driver-side Python left fold per
    key, row for row (Scan.scala:18-60 Scan.from semantics)."""
    rng = np.random.default_rng(11)
    n = 400
    pdf = pd.DataFrame({
        "k": rng.integers(0, 7, size=n),
        "ts": np.sort(rng.uniform(0, 10_000, size=n)),
        "i": np.arange(n),
    })
    pdf = pdf.sample(frac=1.0, random_state=0)  # scramble input order
    df = spark.createDataFrame(pdf)

    got = (Scan.from_fn(_session_step(300.0), (None, 0))
           .apply(df, ["k"], ["ts", "i"], "sess", "bigint")
           .toPandas().sort_values(["k", "ts", "i"]).reset_index(drop=True))

    # reference fold, plain Python per key
    want = []
    for k, g in pdf.sort_values(["k", "ts", "i"]).groupby("k"):
        state = (None, 0)
        for row in g.itertuples(index=False):
            state, o = _session_step(300.0)(state, row)
            want.append((k, row.ts, row.i, o))
    wdf = pd.DataFrame(want, columns=["k", "ts", "i", "sess"]) \
        .sort_values(["k", "ts", "i"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "ts", "i", "sess"]].astype({"sess": "int64"}), wdf)


def test_apply_batch_vectorized_kernel_agrees(spark):
    """The vectorized group kernel (diff/cumsum formulation) produces
    the same session numbering as the row-at-a-time fold."""
    from algebird_spark.operators.scan import GeneralScan
    rng = np.random.default_rng(5)
    n = 500
    pdf = pd.DataFrame({
        "k": rng.integers(0, 5, size=n),
        "ts": rng.uniform(0, 50_000, size=n),
        "i": np.arange(n),
    })
    df = spark.createDataFrame(pdf)

    def kernel(g):
        gaps = g["ts"].diff().fillna(np.inf) > 300.0
        return gaps.cumsum().astype("int64")

    a = (GeneralScan.apply_batch(df, ["k"], ["ts", "i"], kernel,
                                 "sess", "bigint")
         .toPandas().sort_values(["k", "ts", "i"])["sess"].to_numpy())
    b = (Scan.from_fn(_session_step(300.0), (None, 0))
         .apply(df, ["k"], ["ts", "i"], "sess", "bigint")
         .toPandas().sort_values(["k", "ts", "i"])["sess"].to_numpy())
    assert np.array_equal(a, b)


def test_apply_stream_agrees_across_arrow_batches(spark):
    """Law: the streaming partition-ordered fold (apply_stream, one
    mapInPandas pass with carry-over state) == the per-group fold, with
    the Arrow batch size forced tiny so every key group spans several
    batches and the carry path is exercised on both its branches
    (same-key continuation and key change mid-batch)."""
    from algebird_spark.operators.scan import (GeneralScan,
                                               session_numbers_kernel)
    rng = np.random.default_rng(17)
    n = 600
    pdf = pd.DataFrame({
        "k": rng.integers(0, 4, size=n),      # few keys -> long groups
        "ts": rng.uniform(0, 60_000, size=n),
        "i": np.arange(n),
    })
    df = spark.createDataFrame(pdf)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "13")
    try:
        a = (GeneralScan.apply_stream(
                df, ["k"], ["ts", "i"],
                session_numbers_kernel("k", "ts", 300.0),
                "sess", "bigint")
             .toPandas().sort_values(["k", "ts", "i"])["sess"].to_numpy())
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    b = (Scan.from_fn(_session_step(300.0), (None, 0))
         .apply(df, ["k"], ["ts", "i"], "sess", "bigint")
         .toPandas().sort_values(["k", "ts", "i"])["sess"].to_numpy())
    assert np.array_equal(a, b)


def test_apply_stream_single_row_groups(spark):
    """Degenerate cardinality: every key is its own 1-row group (the
    many-tiny-groups regime apply_stream exists for) — each row is
    session 1 of its key."""
    from algebird_spark.operators.scan import (GeneralScan,
                                               session_numbers_kernel)
    pdf = pd.DataFrame({"k": np.arange(200), "ts": np.zeros(200),
                        "i": np.arange(200)})
    df = spark.createDataFrame(pdf)
    out = (GeneralScan.apply_stream(
              df, ["k"], ["ts", "i"],
              session_numbers_kernel("k", "ts", 300.0), "sess", "bigint")
           .toPandas())
    assert len(out) == 200 and (out["sess"] == 1).all()


def test_sessionize_api_sugar(spark):
    """api.sessionize == the apply_stream fold it wraps."""
    from algebird_spark.api import sessionize
    pdf = pd.DataFrame({"u": [1, 1, 1, 2, 2],
                        "t": [0.0, 100.0, 5000.0, 1.0, 9000.0],
                        "i": [0, 1, 2, 3, 4]})
    out = (sessionize(spark.createDataFrame(pdf), "u", "t", 1800.0,
                      order=["t", "i"])
           .toPandas().sort_values(["u", "t"])["session"].tolist())
    assert out == [1, 1, 2, 1, 2]


def test_session_kernel_batch_split_invariance_property():
    """Property (pure pandas, no Spark): for ANY key/ts data and ANY
    batch split, chaining session_numbers_kernel over the splits with
    carry equals running it over the whole sorted frame at once."""
    from hypothesis import given, settings, strategies as st

    from algebird_spark.operators.scan import session_numbers_kernel

    @settings(max_examples=60, deadline=None)
    @given(st.data())
    def run(data):
        n = data.draw(st.integers(1, 120))
        ks = data.draw(st.lists(st.integers(0, 4),
                                min_size=n, max_size=n))
        ts = data.draw(st.lists(st.floats(0, 1e5, allow_nan=False),
                                min_size=n, max_size=n))
        pdf = (pd.DataFrame({"k": ks, "t": ts, "i": range(n)})
               .sort_values(["k", "t", "i"]).reset_index(drop=True))
        gap = data.draw(st.sampled_from([0.0, 10.0, 1e3, 1e9]))

        whole, _ = session_numbers_kernel("k", "t", gap)(pdf, None)

        cuts = sorted(data.draw(st.sets(st.integers(1, max(1, n - 1)),
                                        max_size=5)))
        parts, carry, lo = [], None, 0
        for hi in cuts + [n]:
            if hi <= lo:
                continue
            chunk = pdf.iloc[lo:hi].reset_index(drop=True)
            vals, carry = session_numbers_kernel("k", "t", gap)(chunk, carry)
            parts.append(np.asarray(vals))
            lo = hi
        assert np.array_equal(np.concatenate(parts), np.asarray(whole))

    run()


def test_sketch_scan_prefix_equals_fresh_build(spark):
    """Monoid law behind sketch_scan: the cumulative fold at step k
    must estimate exactly what a fresh single sketch built over the
    whole prefix (steps <= k) estimates — HLL register max is
    associative, so fold-of-parts == build-of-whole."""
    from algebird_spark.agg import sketch_by_key, sketch_global
    from algebird_spark.operators.scan import sketch_scan
    from algebird_spark.sketches import HLL

    ev = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .select("user_id", "event_type",
                  (F.floor(F.col("ts").cast("timestamp").cast("double")
                           / 604800) * 604800).cast("long").alias("week")))
    states = sketch_by_key(ev, ["event_type", "week"], "user_id",
                           lambda: HLL(p=12))
    got = {(r["event_type"], r["week"]): r["estimate"]
           for r in sketch_scan(states, ["event_type"], "week").collect()}
    weeks = sorted({k[1] for k in got})
    etypes = sorted({k[0] for k in got})
    for et in etypes:
        for wk in weeks:
            if (et, wk) not in got:
                continue
            prefix = ev.filter((F.col("event_type") == et)
                               & (F.col("week") <= wk))
            fresh = sketch_global(prefix, "user_id", lambda: HLL(p=12))
            assert got[(et, wk)] == pytest.approx(float(fresh.present()))
