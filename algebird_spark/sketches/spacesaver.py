"""SpaceSaver / StreamSummary heavy hitters with per-item error bounds
(algebird-core .../SpaceSaver.scala:133-292).

State: capacity-m map item -> (count, error). New item when full evicts
the current minimum and inherits its count as error (``loseOne``,
SpaceSaver.scala:243-260). Merge sums counts+errors pairwise and keeps
the top-capacity items (:274-286). ``top_k`` flags which entries are
*guaranteed* (count - error strictly above the next-best upper bound,
:166-187).

Caveat carried over from the reference (:125-131): distributed merge is
heuristic — order-dependent at the margins. TopPct CMS is the
mergeable-by-construction default; SpaceSaver is provided for parity.
"""

from __future__ import annotations

import numpy as np

from .base import KIND_SPACESAVER, Sketch, register


class SpaceSaver(Sketch):
    KIND = KIND_SPACESAVER

    def __init__(self, capacity: int = 100):
        if capacity < 1:
            raise ValueError("capacity must be >= 1")
        self.capacity = capacity
        self.counters: dict[int, tuple[int, int]] = {}  # item -> (count, err)

    def _params(self) -> dict:
        return {"capacity": self.capacity}

    def update_batch(self, values) -> None:
        values = np.asarray(values).astype(np.int64, copy=False)
        if values.size == 0:
            return
        uniq, cnts = np.unique(values, return_counts=True)
        c = self.counters
        for item, n in zip(uniq.tolist(), cnts.tolist()):
            if item in c:
                cc, ee = c[item]
                c[item] = (cc + n, ee)
            elif len(c) < self.capacity:
                c[item] = (n, 0)
            else:
                min_item = min(c, key=lambda k: c[k][0])
                mc, _ = c.pop(min_item)
                c[item] = (mc + n, mc)

    def merge_in_place(self, other: "SpaceSaver") -> "SpaceSaver":
        self.merge_check(other)
        a, b = self.counters, other.counters
        merged: dict[int, tuple[int, int]] = {}
        min_a = min((v[0] for v in a.values()), default=0) if len(a) >= self.capacity else 0
        min_b = min((v[0] for v in b.values()), default=0) if len(b) >= other.capacity else 0
        for item in set(a) | set(b):
            ca, ea = a.get(item, (min_a, min_a))
            cb, eb = b.get(item, (min_b, min_b))
            merged[item] = (ca + cb, ea + eb)
        top = sorted(merged.items(), key=lambda kv: (-kv[1][0], kv[0]))[: self.capacity]
        self.counters = dict(top)
        return self

    def top_k(self, k: int) -> list[tuple[int, int, int, bool]]:
        """[(item, count, error, guaranteed)] sorted by count desc
        (SpaceSaver.scala:166-187)."""
        items = sorted(self.counters.items(), key=lambda kv: (-kv[1][0], kv[0]))
        out = []
        for i, (item, (c, e)) in enumerate(items[:k]):
            nxt = items[i + 1][1][0] if i + 1 < len(items) else 0
            out.append((item, c, e, c - e >= nxt))
        return out

    def most_frequent(self, threshold: int) -> list[tuple[int, int, int, bool]]:
        return [(i, c, e, g) for i, c, e, g in self.top_k(len(self.counters))
                if c >= threshold]

    def present(self) -> dict:
        return {"top": self.top_k(10)}

    def _payload(self) -> bytes:
        # canonical item order (serialization independent of dict order)
        n = len(self.counters)
        items = np.fromiter(self.counters.keys(), dtype=np.int64, count=n)
        cnts = np.fromiter((v[0] for v in self.counters.values()), dtype=np.int64, count=n)
        errs = np.fromiter((v[1] for v in self.counters.values()), dtype=np.int64, count=n)
        o = np.argsort(items, kind="stable")
        return (np.array([n], dtype=np.int64).tobytes()
                + items[o].tobytes() + cnts[o].tobytes() + errs[o].tobytes())


@register(KIND_SPACESAVER)
def _decode_spacesaver(params: dict, payload: bytes) -> SpaceSaver:
    out = SpaceSaver(params["capacity"])
    n = int(np.frombuffer(payload[:8], dtype=np.int64)[0])
    items = np.frombuffer(payload[8 : 8 + 8 * n], dtype=np.int64)
    cnts = np.frombuffer(payload[8 + 8 * n : 8 + 16 * n], dtype=np.int64)
    errs = np.frombuffer(payload[8 + 16 * n : 8 + 24 * n], dtype=np.int64)
    out.counters = {int(i): (int(c), int(e))
                    for i, c, e in zip(items, cnts, errs)}
    return out
