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
