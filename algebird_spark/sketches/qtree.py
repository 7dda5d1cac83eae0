"""QTree: quantile + range-sum sketch over dyadic intervals with HARD
(lower, upper) bounds — the reference's own quantile sketch
(algebird-core .../QTree.scala:166-507).

Representation: mass map {(level, offset): (count, sum)} meaning
``count`` values (summing to ``sum``) lie in
[offset * 2^level, (offset+1) * 2^level). Items enter at ``base_level``
(bin size 2^base_level, QTree.scala:44-55 default -16 for doubles; we
default 0 for integer-ish data). ``compress(k)`` moves nodes with
count < (total >> k) into their parent — coarser location, identical
total mass — bounding the node count like QTree.scala:355-393
(<= 2^(k+2) nodes, QTreeTest.scala:99-103).

Bounds semantics (QTree.scala:285-348): with interval masses
[a_i, b_i) x m_i,
  max_rank(x) = mass with a_i <  x   (could be below x)
  min_rank(x) = mass with b_i <= x   (certainly below x)
  quantile_bounds(p) = (smallest a where cum-by-a reaches p*total,
                        smallest b where cum-by-b reaches p*total)
— the true p-quantile provably lies in [lower, upper].
"""

from __future__ import annotations

import numpy as np

from .base import KIND_QTREE, Sketch, register


class QTree(Sketch):
    KIND = KIND_QTREE

    def __init__(self, k: int = 10, base_level: int = 0):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = k
        self.base_level = base_level
        # per-level {offset: (count, sum)}
        self.nodes: dict[int, dict[int, tuple[int, float]]] = {}
        self.total = 0

    def _params(self) -> dict:
        return {"k": self.k, "base_level": self.base_level}

    # ------------------------------------------------------------------
    def update_batch(self, values) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if values.size == 0:
            return
        scale = 2.0 ** (-self.base_level)
        offs = np.floor(values * scale).astype(np.int64)
        order = np.argsort(offs, kind="stable")
        offs_s = offs[order]
        vals_s = values[order]
        uniq, starts = np.unique(offs_s, return_index=True)
        counts = np.diff(np.append(starts, len(offs_s)))
        sums = np.add.reduceat(vals_s, starts)
        lvl = self.nodes.setdefault(self.base_level, {})
        for o, c, s in zip(uniq.tolist(), counts.tolist(), sums.tolist()):
            pc, ps = lvl.get(o, (0, 0.0))
            lvl[o] = (pc + c, ps + s)
        self.total += int(values.size)
        self._compress()

    def merge_in_place(self, other: "QTree") -> "QTree":
        self.merge_check(other)
        for level, om in other.nodes.items():
            lvl = self.nodes.setdefault(level, {})
            for o, (c, s) in om.items():
                pc, ps = lvl.get(o, (0, 0.0))
                lvl[o] = (pc + c, ps + s)
        self.total += other.total
        self._compress()
        return self

    def _node_count(self) -> int:
        return sum(len(m) for m in self.nodes.values())

    def _compress(self) -> None:
        thresh = max(1, self.total >> self.k)
        if thresh <= 1:
            return
        for level in sorted(self.nodes):
            m = self.nodes[level]
            if not m:
                continue
            small = [(o, cs) for o, cs in m.items() if cs[0] < thresh]
            if not small:
                continue
            parent = self.nodes.setdefault(level + 1, {})
            for o, (c, s) in small:
                del m[o]
                po = o >> 1
                pc, ps = parent.get(po, (0, 0.0))
                parent[po] = (pc + c, ps + s)
        self.nodes = {l: m for l, m in self.nodes.items() if m}

    # ------------------------------------------------------------------
    def _intervals(self) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """(a, b, count, sum) arrays over all nodes."""
        a_l, b_l, c_l, s_l = [], [], [], []
        for level, m in self.nodes.items():
            width = 2.0 ** level
            for o, (c, s) in m.items():
                a_l.append(o * width)
                b_l.append((o + 1) * width)
                c_l.append(c)
                s_l.append(s)
        return (np.array(a_l), np.array(b_l),
                np.array(c_l, dtype=np.int64), np.array(s_l))

    def quantile_bounds(self, p: float) -> tuple[float, float]:
        if self.total == 0:
            return float("nan"), float("nan")
        p = min(max(p, 0.0), 1.0)
        target = p * self.total
        a, b, c, _ = self._intervals()
        ia = np.argsort(a, kind="stable")
        cum_a = np.cumsum(c[ia])
        ib = np.argsort(b, kind="stable")
        cum_b = np.cumsum(c[ib])
        # lower: smallest interval-start where possibly-below mass >= target
        i = int(np.searchsorted(cum_a, target, side="left"))
        lower = float(a[ia][min(i, len(ia) - 1)])
        # upper: smallest interval-end where certainly-below mass >= target
        j = int(np.searchsorted(cum_b, target, side="left"))
        upper = float(b[ib][min(j, len(ib) - 1)])
        return lower, upper

    def quantile(self, p: float) -> float:
        lo, hi = self.quantile_bounds(p)
        return (lo + hi) / 2.0

    def range_count_bounds(self, lo: float, hi: float) -> tuple[int, int]:
        """(min, max) possible count of values in [lo, hi)
        (QTree.scala:321-348)."""
        a, b, c, _ = self._intervals()
        fully = (a >= lo) & (b <= hi)
        overlap = (a < hi) & (b > lo)
        return int(c[fully].sum()), int(c[overlap].sum())

    def range_sum_bounds(self, lo: float, hi: float) -> tuple[float, float]:
        a, b, c, s = self._intervals()
        fully = (a >= lo) & (b <= hi)
        overlap = (a < hi) & (b > lo)
        return float(s[fully].sum()), float(s[overlap].sum())

    def inter_quartile_mean(self) -> tuple[float, float]:
        """Bounds on the mean of the middle 50% (QTree.scala:439-449)."""
        q1_lo, q1_hi = self.quantile_bounds(0.25)
        q3_lo, q3_hi = self.quantile_bounds(0.75)
        s_lo, s_hi = self.range_sum_bounds(q1_hi, q3_lo)
        n = self.total / 2.0
        if n <= 0 or s_hi <= 0:
            return float("nan"), float("nan")
        return s_lo / n, self.range_sum_bounds(q1_lo, q3_hi)[1] / n

    def present(self) -> dict:
        return {"total": self.total,
                "median_bounds": self.quantile_bounds(0.5),
                "nodes": self._node_count()}

    # ------------------------------------------------------------------
    def _payload(self) -> bytes:
        # canonical: levels ascending AND offsets sorted within each
        # level, so byte-equality of equal states holds regardless of
        # build/merge order (the convention every other sketch follows)
        parts = [np.array([self.total, len(self.nodes)], dtype=np.int64).tobytes()]
        for level in sorted(self.nodes):
            m = self.nodes[level]
            offs = np.fromiter(m.keys(), dtype=np.int64, count=len(m))
            cnts = np.fromiter((v[0] for v in m.values()), dtype=np.int64, count=len(m))
            sums = np.fromiter((v[1] for v in m.values()), dtype=np.float64, count=len(m))
            o = np.argsort(offs, kind="stable")
            parts.append(np.array([level, len(m)], dtype=np.int64).tobytes())
            parts.append(offs[o].tobytes())
            parts.append(cnts[o].tobytes())
            parts.append(sums[o].tobytes())
        return b"".join(parts)


@register(KIND_QTREE)
def _decode_qtree(params: dict, payload: bytes) -> QTree:
    out = QTree(params["k"], params["base_level"])
    total, n_levels = np.frombuffer(payload[:16], dtype=np.int64)
    out.total = int(total)
    off = 16
    for _ in range(int(n_levels)):
        level, n = np.frombuffer(payload[off : off + 16], dtype=np.int64)
        off += 16
        offs = np.frombuffer(payload[off : off + 8 * n], dtype=np.int64)
        off += 8 * int(n)
        cnts = np.frombuffer(payload[off : off + 8 * n], dtype=np.int64)
        off += 8 * int(n)
        sums = np.frombuffer(payload[off : off + 8 * n], dtype=np.float64)
        off += 8 * int(n)
        if len(offs) != n or len(cnts) != n or len(sums) != n:
            raise ValueError("truncated QTree level payload")
        out.nodes[int(level)] = {int(o): (int(c), float(s))
                                 for o, c, s in zip(offs, cnts, sums)}
    if off != len(payload):
        raise ValueError("QTree payload has trailing bytes")
    return out
