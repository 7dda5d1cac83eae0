"""Moments + AveragedValue + SetSize mergeable states.

* ``Moments``: count + mean + 2nd/3rd/4th central moments with the
  numerically-stable parallel combine of Chan et al. — the same
  formulas as algebird-core .../MomentsGroup.scala:279-388. On Spark,
  prefer the built-in var_pop/skewness/kurtosis (operators/exact.py);
  this state exists for streaming/state usage and law tests.
* ``SetSize``: exact set until ``max_set_size`` then HLL —
  ``SetSizeAggregator`` via ``EventuallyMonoidAggregator``
  (algebird-core .../HyperLogLog.scala:718-745, Eventually.scala).
"""

from __future__ import annotations

import numpy as np

from .base import KIND_MOMENTS, KIND_SETSIZE, Sketch, register
from .eventually import Eventually
from .hll import HLL


class Moments(Sketch):
    KIND = KIND_MOMENTS

    def __init__(self):
        self.n = 0.0
        self.mean = 0.0
        self.m2 = 0.0
        self.m3 = 0.0
        self.m4 = 0.0

    def _params(self) -> dict:
        return {}

    def update_batch(self, values) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if values.size == 0:
            return
        other = Moments()
        other.n = float(values.size)
        other.mean = float(values.mean())
        d = values - other.mean
        other.m2 = float(np.sum(d * d))
        other.m3 = float(np.sum(d ** 3))
        other.m4 = float(np.sum(d ** 4))
        self._combine(other)

    def merge_in_place(self, other: "Moments") -> "Moments":
        self.merge_check(other)
        self._combine(other)
        return self

    def _combine(self, o: "Moments") -> None:
        """Chan et al. parallel update (MomentsGroup.scala:306-388)."""
        if o.n == 0:
            return
        if self.n == 0:
            self.n, self.mean, self.m2, self.m3, self.m4 = o.n, o.mean, o.m2, o.m3, o.m4
            return
        n1, n2 = self.n, o.n
        n = n1 + n2
        delta = o.mean - self.mean
        d_n = delta / n
        m2 = self.m2 + o.m2 + delta * d_n * n1 * n2
        m3 = (self.m3 + o.m3
              + delta * d_n * d_n * n1 * n2 * (n1 - n2)
              + 3.0 * d_n * (n1 * o.m2 - n2 * self.m2))
        m4 = (self.m4 + o.m4
              + delta * d_n ** 3 * n1 * n2 * (n1 * n1 - n1 * n2 + n2 * n2)
              + 6.0 * d_n * d_n * (n1 * n1 * o.m2 + n2 * n2 * self.m2)
              + 4.0 * d_n * (n1 * o.m3 - n2 * self.m3))
        self.mean += d_n * n2
        self.n, self.m2, self.m3, self.m4 = n, m2, m3, m4

    @property
    def variance(self) -> float:
        return self.m2 / self.n if self.n > 0 else float("nan")

    @property
    def stddev(self) -> float:
        return self.variance ** 0.5

    @property
    def skewness(self) -> float:
        if self.n == 0 or self.m2 == 0:
            return float("nan")
        return (self.m3 / self.n) / (self.m2 / self.n) ** 1.5

    @property
    def kurtosis(self) -> float:
        """Excess kurtosis (matches Spark's ``kurtosis``)."""
        if self.n == 0 or self.m2 == 0:
            return float("nan")
        return (self.m4 / self.n) / (self.m2 / self.n) ** 2 - 3.0

    def scale(self, z: float) -> "Moments":
        """Weight decay (MomentsGroup.scala:139-145): multiplies the
        count-mass, keeps the shape."""
        out = Moments()
        out.n = self.n * z
        out.mean = self.mean
        out.m2, out.m3, out.m4 = self.m2 * z, self.m3 * z, self.m4 * z
        return out

    def present(self) -> dict:
        return {"n": self.n, "mean": self.mean, "variance": self.variance,
                "skewness": self.skewness, "kurtosis": self.kurtosis}

    def _payload(self) -> bytes:
        return np.array([self.n, self.mean, self.m2, self.m3, self.m4],
                        dtype=np.float64).tobytes()


@register(KIND_MOMENTS)
def _decode_moments(params: dict, payload: bytes) -> Moments:
    out = Moments()
    out.n, out.mean, out.m2, out.m3, out.m4 = np.frombuffer(payload, dtype=np.float64)
    return out


class SetSize(Eventually):
    """Exact distinct set until ``max_set_size``, then HLL(p) —
    ``SetSizeAggregator`` via ``EventuallyMonoidAggregator``
    (HyperLogLog.scala:718-745). Round 4: rebased on the generic
    :class:`~.eventually.Eventually` combinator (Eventually.scala
    semantics) while keeping its own KIND byte and round-3 wire
    format, so persisted states keep decoding."""

    KIND = KIND_SETSIZE

    def __init__(self, max_set_size: int = 10_000, p: int = 14,
                 seed: int = 12345678):
        super().__init__(HLL(p, seed), max_set_size, "set")
        self.max_set_size = max_set_size
        self.p = p
        self.seed = seed

    def _params(self) -> dict:
        # round-3 wire format: the HLL prototype is implied by (p, seed)
        return {"max_set_size": self.max_set_size, "p": self.p,
                "seed": self.seed}

    @property
    def hll(self) -> HLL | None:
        """Round-3 attribute name for the eventual side."""
        return self.approx

    def size(self) -> float:
        return self.estimate()

    def present(self) -> float:
        return self.size()

    def _payload(self) -> bytes:
        if self.exact is not None:
            return b"\x01" + self._exact_values().tobytes()
        return b"\x02" + self.approx.to_bytes()


@register(KIND_SETSIZE)
def _decode_setsize(params: dict, payload: bytes) -> SetSize:
    from .base import from_bytes
    out = SetSize(params["max_set_size"], params["p"], params["seed"])
    if payload[0] == 1:
        out.exact = set(np.frombuffer(payload[1:], dtype=np.int64).tolist())
    else:
        out.exact = None
        out.approx = from_bytes(payload[1:])
    return out
