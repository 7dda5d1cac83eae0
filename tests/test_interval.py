"""Interval predicate algebra laws (Interval.scala:80-125): the
intersection monoid (Universe identity, Empty absorbing, associative,
commutative, idempotent), contains-consistency of intersections, and
the plan-side predicate pushing to the parquet scan."""

import math

import numpy as np
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from algebird_spark.functions.interval import Interval

_bound = st.one_of(st.none(), st.integers(-50, 50).map(float))
_iv = st.builds(
    lambda lo, li, hi, hi_i: Interval(
        lo, li if lo is not None else False,
        hi, hi_i if hi is not None else False),
    _bound, st.booleans(), _bound, st.booleans())
_xs = st.lists(st.integers(-60, 60).map(float), min_size=1, max_size=50)


@given(a=_iv, b=_iv, xs=_xs)
@settings(max_examples=200, deadline=None)
def test_intersection_contains_is_pointwise_and(a, b, xs):
    c = a & b
    for x in xs:
        assert c.contains(x) == (a.contains(x) and b.contains(x)), (a, b, x)


@given(a=_iv, b=_iv, c=_iv, xs=_xs)
@settings(max_examples=100, deadline=None)
def test_intersection_monoid_laws(a, b, c, xs):
    for x in xs:
        assert ((a & b) & c).contains(x) == (a & (b & c)).contains(x)
        assert (a & b).contains(x) == (b & a).contains(x)
        assert (a & a).contains(x) == a.contains(x)
        assert (a & Interval.universe()).contains(x) == a.contains(x)
    assert (a & Interval.empty_interval()).is_empty


def test_boundary_semantics():
    assert Interval.closed(1, 3).contains(1)
    assert Interval.closed(1, 3).contains(3)
    lcro = Interval.left_closed_right_open(1, 3)
    assert lcro.contains(1) and not lcro.contains(3)
    assert (Interval.above(2) & Interval.below(2)).is_empty
    assert (Interval.at_least(2) & Interval.at_most(2)).contains(2)
    assert Interval.universe().is_universe


def test_nan_total_order_matches_spark(spark):
    """NaN orders greater than every double (Scala Ordering / Spark SQL
    total order): it satisfies any lower bound, fails any upper bound,
    and contains() agrees with the plan-side predicate() row-for-row
    (ADVICE r4 divergence)."""
    nan = float("nan")
    assert Interval.universe().contains(nan)
    assert Interval.at_least(5.0).contains(nan)
    assert Interval.above(5.0).contains(nan)
    assert not Interval.at_most(5.0).contains(nan)
    assert not Interval.below(5.0).contains(nan)
    assert not Interval.closed(1.0, 9.0).contains(nan)
    assert not Interval.empty_interval().contains(nan)

    xs = [1.0, 5.0, 7.5, nan]
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    for iv in (Interval.universe(), Interval.at_least(5.0),
               Interval.at_most(5.0), Interval.closed(1.0, 9.0),
               Interval.above(7.5), Interval.empty_interval()):
        got = sorted(str(r["x"]) for r in
                     df.filter(iv.predicate(F.col("x"))).collect())
        want = sorted(str(x) for x in xs if iv.contains(x))
        assert got == want, iv


@given(a=_iv, xs=_xs)
@settings(max_examples=25, deadline=None)
def test_spark_predicate_matches_contains(spark, a, xs):
    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    got = {r["x"] for r in df.filter(a.predicate(F.col("x"))).collect()}
    want = {x for x in xs if a.contains(x)}
    assert got == want


def test_predicate_pushes_to_parquet_scan(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("iv") / "t.parquet")
    spark.range(1000).selectExpr("CAST(id AS DOUBLE) AS x") \
        .write.mode("overwrite").parquet(path)
    iv = Interval.closed(10, 20) & Interval.below(18)
    out = spark.read.parquet(path).filter(iv.predicate(F.col("x")))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual" in plan, plan
    assert out.count() == 8  # [10, 18): 10..17


def test_from_approximate_intersection():
    from algebird_spark.sketches import Approximate
    a = Approximate(90, 100, 112, 0.95)
    b = Approximate(95, 105, 120, 0.95)
    iv = (Interval.from_approximate(a) & Interval.from_approximate(b))
    assert iv.contains(100) and iv.contains(95) and iv.contains(112)
    assert not iv.contains(94) and not iv.contains(113)
