"""Merging t-digest (Dunning & Ertl, "Computing Extremely Accurate
Quantiles Using t-Digests", public paper — see PAPERS.md context).

The reference (twitter/algebird) has no t-digest; per BASELINE.json it
is required alongside the QTree-semantics quantile API. This is the
*merging* variant: a sorted centroid list (mean, weight) compressed in
a single pass under the k1 scale function
``k(q) = (delta / 2pi) * asin(2q - 1)``, which bounds centroid sizes by
~ delta * q(1-q) — high resolution at the tails.

Deterministic: no randomness; merge of two digests = concatenate
centroids + one merge pass. Associativity holds up to centroid
granularity (estimate-tolerance in laws tests, like all approx types).
"""

from __future__ import annotations

import math

import numpy as np

from .base import KIND_TDIGEST, Sketch, register


class TDigest(Sketch):
    KIND = KIND_TDIGEST

    def __init__(self, compression: float = 200.0):
        if compression < 20:
            raise ValueError("compression must be >= 20")
        self.compression = float(compression)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.n = 0.0
        self.min_v = np.inf
        self.max_v = -np.inf
        self._buf: list[np.ndarray] = []
        self._buf_size = 0
        self._buf_cap = max(512, int(10 * compression))

    def _params(self) -> dict:
        return {"compression": self.compression}

    # ------------------------------------------------------------------
    def _k(self, q: np.ndarray | float) -> np.ndarray | float:
        return self.compression / (2 * math.pi) * np.arcsin(2 * np.clip(q, 0, 1) - 1)

    _CHUNK = 1 << 16  # flush-sort stays cache-resident

    def update_batch(self, values) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if values.size == 0:
            return
        for lo in range(0, values.shape[0], self._CHUNK):
            chunk = values[lo:lo + self._CHUNK]
            self._buf.append(chunk)
            self._buf_size += chunk.size
            if self._buf_size >= self._buf_cap:
                self._flush()

    def _flush(self) -> None:
        if not self._buf:
            return
        vals = np.concatenate(self._buf)
        self._buf = []
        self._buf_size = 0
        self.min_v = min(self.min_v, float(vals.min()))
        self.max_v = max(self.max_v, float(vals.max()))
        means = np.concatenate([self.means, vals])
        weights = np.concatenate([self.weights, np.ones(len(vals))])
        self._merge_pass(means, weights)

    def _merge_pass(self, means: np.ndarray, weights: np.ndarray) -> None:
        """Vectorized merging pass: assign each point the cluster index
        floor(k(q_mid)) of its cumulative midpoint rank and combine
        clusters with one reduceat — every resulting centroid spans a
        k-width <= 1, honoring the t-digest size invariant, with no
        per-point Python loop."""
        order = np.argsort(means, kind="stable")
        means = means[order]
        weights = weights[order]
        total = float(weights.sum())
        self.n = total
        cum = np.cumsum(weights)
        q_mid = (cum - weights / 2) / total
        kidx = np.floor(self._k(q_mid)).astype(np.int64)
        starts = np.concatenate([[0], np.flatnonzero(np.diff(kidx)) + 1])
        new_w = np.add.reduceat(weights, starts)
        new_m = np.add.reduceat(weights * means, starts) / new_w
        self.means = new_m
        self.weights = new_w

    # ------------------------------------------------------------------
    def merge_in_place(self, other: "TDigest") -> "TDigest":
        self.merge_check(other)
        self._flush()
        o = other._flushed()
        if o.n == 0:
            return self
        self.min_v = min(self.min_v, o.min_v)
        self.max_v = max(self.max_v, o.max_v)
        if len(self.means) == 0:
            self.means, self.weights, self.n = o.means.copy(), o.weights.copy(), o.n
            return self
        self._merge_pass(np.concatenate([self.means, o.means]),
                         np.concatenate([self.weights, o.weights]))
        return self

    def _flushed(self) -> "TDigest":
        self._flush()
        return self

    # ------------------------------------------------------------------
    def quantile(self, p: float) -> float:
        self._flush()
        if self.n == 0:
            return float("nan")
        if p <= 0:
            return self.min_v
        if p >= 1:
            return self.max_v
        m, w = self.means, self.weights
        if len(m) == 1:
            return float(m[0])
        # centroid centers at cumulative weight (cum - w/2)
        centers = np.cumsum(w) - w / 2
        target = p * self.n
        if target <= centers[0]:
            # interpolate min -> first centroid
            f = target / centers[0]
            return float(self.min_v + f * (m[0] - self.min_v))
        if target >= centers[-1]:
            f = (target - centers[-1]) / (self.n - centers[-1])
            return float(m[-1] + f * (self.max_v - m[-1]))
        i = int(np.searchsorted(centers, target, side="right")) - 1
        f = (target - centers[i]) / (centers[i + 1] - centers[i])
        return float(m[i] + f * (m[i + 1] - m[i]))

    def quantiles(self, ps) -> np.ndarray:
        return np.array([self.quantile(p) for p in np.asarray(ps, dtype=np.float64)])

    def rank(self, value: float) -> float:
        self._flush()
        if self.n == 0:
            return float("nan")
        if value < self.min_v:
            return 0.0
        if value >= self.max_v:
            return 1.0
        m, w = self.means, self.weights
        centers = np.cumsum(w) - w / 2
        i = int(np.searchsorted(m, value, side="right"))
        if i == 0:
            f = (value - self.min_v) / max(m[0] - self.min_v, 1e-300)
            return float(f * centers[0] / self.n)
        if i >= len(m):
            f = (value - m[-1]) / max(self.max_v - m[-1], 1e-300)
            return float((centers[-1] + f * (self.n - centers[-1])) / self.n)
        f = (value - m[i - 1]) / max(m[i] - m[i - 1], 1e-300)
        r = centers[i - 1] + f * (centers[i] - centers[i - 1])
        return float(r / self.n)

    def quantile_bounds(self, p: float) -> tuple[float, float]:
        """(lower, upper) from the max centroid rank-width around p —
        the t-digest bound is quantile-dependent (tighter at tails)."""
        self._flush()
        if self.n == 0:
            return float("nan"), float("nan")
        # local rank uncertainty ~ half the local centroid weight
        local = 2.0 * np.max(self.weights) / self.n if len(self.weights) else 0.0
        eps = max(local, 1.0 / self.n)
        return self.quantile(max(0.0, p - eps)), self.quantile(min(1.0, p + eps))

    def present(self) -> dict:
        self._flush()
        return {"n": self.n,
                "quantiles": {str(p): self.quantile(p) for p in (0.01, 0.25, 0.5, 0.75, 0.99)}}

    # ------------------------------------------------------------------
    def _payload(self) -> bytes:
        self._flush()
        return (np.array([self.n, self.min_v, self.max_v], dtype=np.float64).tobytes()
                + np.array([len(self.means)], dtype=np.int64).tobytes()
                + self.means.tobytes() + self.weights.tobytes())


@register(KIND_TDIGEST)
def _decode_tdigest(params: dict, payload: bytes) -> TDigest:
    out = TDigest(params["compression"])
    out.n, out.min_v, out.max_v = np.frombuffer(payload[:24], dtype=np.float64)
    nc = int(np.frombuffer(payload[24:32], dtype=np.int64)[0])
    out.means = np.frombuffer(payload[32 : 32 + 8 * nc], dtype=np.float64).copy()
    out.weights = np.frombuffer(payload[32 + 8 * nc : 32 + 16 * nc], dtype=np.float64).copy()
    out.n = float(out.n)
    return out
