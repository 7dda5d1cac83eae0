"""Composable interval predicate algebra — reference
``Interval.scala:80-125`` (algebird-core): ``Empty``, ``Universe``,
``InclusiveLower`` / ``ExclusiveLower`` / ``InclusiveUpper`` /
``ExclusiveUpper`` and their intersections, normalized into a single
immutable ``Interval`` value with ``&&`` (here ``&``) as the
intersection monoid (``Universe`` is the identity, ``Empty`` the
absorbing element).

Two consumption surfaces:

* driver-side: ``contains(x)`` / ``is_empty`` — e.g. intersecting the
  ``Approximate`` bound intervals two sketches report;
* plan-side: ``predicate(col)`` renders the interval as a Spark
  Column, so an interval computed from sketch state prunes a scan
  (and Catalyst pushes the resulting comparison predicates down to
  the parquet reader like any other filter).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column


@dataclass(frozen=True)
class Interval:
    """Normalized interval: bounds of ``None`` mean unbounded on that
    side; inclusiveness flags are meaningless (and normalized False)
    for unbounded sides. The empty interval is canonical:
    ``Interval.empty()`` — any unsatisfiable intersection collapses
    to it, so ``is_empty`` is a simple flag test."""

    low: float | None = None
    low_inclusive: bool = False
    high: float | None = None
    high_inclusive: bool = False
    empty: bool = False

    # ------------------------------------------------------ constructors
    @staticmethod
    def universe() -> "Interval":
        return Interval()

    @staticmethod
    def from_approximate(approx) -> "Interval":
        """The closed bound interval of an
        :class:`~..sketches.base.Approximate` estimate — intersect the
        intervals of two sketch answers to combine their evidence."""
        return Interval.closed(float(approx.low), float(approx.high))

    @staticmethod
    def empty_interval() -> "Interval":
        return Interval(empty=True)

    @staticmethod
    def at_least(x: float) -> "Interval":          # InclusiveLower
        return Interval(low=x, low_inclusive=True)

    @staticmethod
    def above(x: float) -> "Interval":             # ExclusiveLower
        return Interval(low=x, low_inclusive=False)

    @staticmethod
    def at_most(x: float) -> "Interval":           # InclusiveUpper
        return Interval(high=x, high_inclusive=True)

    @staticmethod
    def below(x: float) -> "Interval":             # ExclusiveUpper
        return Interval(high=x, high_inclusive=False)

    @staticmethod
    def closed(lo: float, hi: float) -> "Interval":
        """[lo, hi] — Interval.closed / leftClosedRightClosed."""
        return Interval.at_least(lo) & Interval.at_most(hi)

    @staticmethod
    def left_closed_right_open(lo: float, hi: float) -> "Interval":
        return Interval.at_least(lo) & Interval.below(hi)

    # ---------------------------------------------------------- algebra
    def __and__(self, other: "Interval") -> "Interval":
        """Intersection (Interval.scala ``&&``): tightest bounds win;
        an unsatisfiable combination collapses to the canonical
        Empty."""
        if self.empty or other.empty:
            return Interval.empty_interval()
        lo, lo_inc = self.low, self.low_inclusive
        if other.low is not None and (lo is None or other.low > lo
                                      or (other.low == lo
                                          and not other.low_inclusive)):
            lo, lo_inc = other.low, other.low_inclusive
        hi, hi_inc = self.high, self.high_inclusive
        if other.high is not None and (hi is None or other.high < hi
                                       or (other.high == hi
                                           and not other.high_inclusive)):
            hi, hi_inc = other.high, other.high_inclusive
        if lo is not None and hi is not None:
            if lo > hi or (lo == hi and not (lo_inc and hi_inc)):
                return Interval.empty_interval()
        return Interval(lo, lo_inc if lo is not None else False,
                        hi, hi_inc if hi is not None else False)

    # ------------------------------------------------------------ query
    @property
    def is_empty(self) -> bool:
        return self.empty

    @property
    def is_universe(self) -> bool:
        return not self.empty and self.low is None and self.high is None

    def contains(self, x: float) -> bool:
        if self.empty:
            return False
        if math.isnan(x):
            # NaN orders GREATER than every double both in Scala's
            # Ordering[Double] (which the reference's Interval.scala
            # predicates use) and in Spark SQL comparisons — so a NaN
            # satisfies any lower bound and fails any upper bound.
            # Keeping that total order here makes contains() agree with
            # predicate()'s plan-side filtering row-for-row (ADVICE r4).
            return self.high is None
        if self.low is not None:
            if x < self.low or (x == self.low and not self.low_inclusive):
                return False
        if self.high is not None:
            if x > self.high or (x == self.high
                                 and not self.high_inclusive):
                return False
        return True

    # -------------------------------------------------------- plan-side
    def predicate(self, col: Column) -> Column:
        """Render as a Spark Column predicate — plain comparisons, so
        Catalyst pushes them to the scan (PushedFilters)."""
        from pyspark.sql import functions as F
        if self.empty:
            return F.lit(False)
        pred = F.lit(True)
        if self.low is not None:
            pred = pred & (col >= self.low if self.low_inclusive
                           else col > self.low)
        if self.high is not None:
            pred = pred & (col <= self.high if self.high_inclusive
                           else col < self.high)
        return pred
