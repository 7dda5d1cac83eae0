"""KLL quantile sketch (Karnin–Lall–Liberty) with QTree-style bounds API.

Algorithm from the published papers "Optimal Quantile Approximation in
Streams" (KLL, FOCS'16) and "Relative Error Streaming Quantiles"
(PODS'21, see PAPERS.md); parameterization follows the public Apache
DataSketches KLL description: per-level capacity
``cap(l) = max(2, ceil(k * c^(numLevels-1-l)))`` with c = 2/3, items at
level ``l`` carry weight ``2^l``, compaction keeps every other item of
a sorted level starting at a random offset.

The reference (twitter/algebird) has no KLL; its quantile sketch is
QTree (algebird-core .../QTree.scala). We expose QTree's *API contract*
— ``quantile_bounds(p) -> (lower, upper)`` (QTree.scala:285-315) — with
KLL's published normalized rank-error bound
``eps ~= 2.296 / k^0.9`` (99% confidence, DataSketches empirical fit of
the paper's O(1/k) bound).

Mergeable: merge concatenates per-level arrays then re-compacts; the
monoid laws hold on estimates (compaction randomness is seeded, so laws
tests use estimate-tolerance, as algebird does for approx types).
"""

from __future__ import annotations

import numpy as np

from .base import KIND_KLL, Sketch, register

_C = 2.0 / 3.0


def kll_rank_error(k: int) -> float:
    return 2.296 / (k ** 0.9)


class KLL(Sketch):
    KIND = KIND_KLL

    def __init__(self, k: int = 200, seed: int = 42):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = k
        self.seed = seed
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self.min_v = np.inf
        self.max_v = -np.inf
        self._rng = np.random.default_rng(seed)

    def _params(self) -> dict:
        return {"k": self.k, "seed": self.seed}

    @property
    def eps(self) -> float:
        return kll_rank_error(self.k)

    # ------------------------------------------------------------------
    def _cap(self, level: int, num_levels: int) -> int:
        return max(2, int(np.ceil(self.k * _C ** (num_levels - 1 - level))))

    def _total_cap(self) -> int:
        nl = len(self.levels)
        return sum(self._cap(l, nl) for l in range(nl))

    def _size(self) -> int:
        return sum(len(a) for a in self.levels)

    def update_batch(self, values) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if values.size == 0:
            return
        self.n += values.size
        self.min_v = min(self.min_v, float(values.min()))
        self.max_v = max(self.max_v, float(values.max()))
        self.levels[0] = np.concatenate([self.levels[0], values])
        self._compress()

    def _compress(self) -> None:
        while self._size() > self._total_cap():
            nl = len(self.levels)
            # compact the lowest level over its capacity
            for l in range(nl):
                if len(self.levels[l]) > self._cap(l, nl):
                    self._compact_level(l)
                    break
            else:
                break

    def _compact_level(self, l: int) -> None:
        arr = np.sort(self.levels[l])
        # odd count: hold one item back at this level so total weight stays exact
        if len(arr) % 2 == 1:
            leftover, arr = arr[-1:], arr[:-1]
        else:
            leftover = np.empty(0, dtype=np.float64)
        off = int(self._rng.integers(0, 2))
        kept = arr[off::2]
        self.levels[l] = leftover.astype(np.float64)
        if l + 1 == len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        self.levels[l + 1] = np.concatenate([self.levels[l + 1], kept])

    # ------------------------------------------------------------------
    def merge_in_place(self, other: "KLL") -> "KLL":
        self.merge_check(other)
        if other.n == 0:
            return self
        self.n += other.n
        self.min_v = min(self.min_v, other.min_v)
        self.max_v = max(self.max_v, other.max_v)
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for l, arr in enumerate(other.levels):
            if len(arr):
                self.levels[l] = np.concatenate([self.levels[l], arr])
        self._compress()
        return self

    # ------------------------------------------------------------------
    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for l, arr in enumerate(self.levels):
            if len(arr):
                items.append(arr)
                weights.append(np.full(len(arr), 1 << l, dtype=np.int64))
        if not items:
            return np.empty(0), np.empty(0, dtype=np.int64)
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], wt[order]

    def quantile(self, p: float) -> float:
        """Value whose estimated rank is p (p in [0,1])."""
        if self.n == 0:
            return float("nan")
        if p <= 0:
            return self.min_v
        if p >= 1:
            return self.max_v
        it, wt = self._weighted_items()
        cum = np.cumsum(wt)
        target = p * cum[-1]
        i = int(np.searchsorted(cum, target, side="left"))
        return float(it[min(i, len(it) - 1)])

    def quantiles(self, ps) -> np.ndarray:
        return np.array([self.quantile(p) for p in np.asarray(ps, dtype=np.float64)])

    def rank(self, value: float) -> float:
        """Estimated normalized rank of value."""
        if self.n == 0:
            return float("nan")
        it, wt = self._weighted_items()
        cum = np.concatenate([[0], np.cumsum(wt)])
        i = int(np.searchsorted(it, value, side="right"))
        return float(cum[i] / cum[-1])

    def quantile_bounds(self, p: float) -> tuple[float, float]:
        """(lower, upper) such that the true p-quantile lies within w.h.p.
        — QTree-style bounds contract (QTree.scala:285-315) using the
        published KLL rank-error eps."""
        lo = self.quantile(max(0.0, p - self.eps))
        hi = self.quantile(min(1.0, p + self.eps))
        return lo, hi

    def present(self) -> dict:
        return {"n": self.n,
                "quantiles": {str(p): self.quantile(p) for p in (0.01, 0.25, 0.5, 0.75, 0.99)}}

    # ------------------------------------------------------------------
    def _payload(self) -> bytes:
        parts = [np.array([self.n], dtype=np.int64).tobytes(),
                 np.array([self.min_v, self.max_v], dtype=np.float64).tobytes(),
                 np.array([len(self.levels)], dtype=np.int32).tobytes()]
        for arr in self.levels:
            parts.append(np.array([len(arr)], dtype=np.int64).tobytes())
            parts.append(np.asarray(arr, dtype=np.float64).tobytes())
        return b"".join(parts)


@register(KIND_KLL)
def _decode_kll(params: dict, payload: bytes) -> KLL:
    out = KLL(params["k"], params["seed"])
    out.n = int(np.frombuffer(payload[:8], dtype=np.int64)[0])
    out.min_v, out.max_v = np.frombuffer(payload[8:24], dtype=np.float64)
    nl = int(np.frombuffer(payload[24:28], dtype=np.int32)[0])
    off = 28
    levels = []
    for _ in range(nl):
        ln = int(np.frombuffer(payload[off : off + 8], dtype=np.int64)[0])
        off += 8
        arr = np.frombuffer(payload[off : off + 8 * ln],
                            dtype=np.float64).copy()
        if len(arr) != ln:
            raise ValueError("truncated KLL level payload")
        levels.append(arr)
        off += 8 * ln
    if off != len(payload):
        raise ValueError("KLL payload has trailing bytes")
    out.levels = levels
    return out
