"""HyperLogLog with sparse/dense register states.

Semantics follow algebird-core .../HyperLogLog.scala:
  * register index = low ``p`` bits of a 64-bit murmur hash, rho =
    (trailing-zero count of the remaining bits) + 1 — algebird reads the
    128-bit hash in little-endian bit order (HyperLogLog.scala:94-146);
    low-bits indexing preserves its key property: ``downsize`` to fewer
    bits is exact (HyperLogLog.scala:361-390).
  * sparse -> dense promotion when ``len(sparse) * 16 > 2^p``
    (SparseHLL.+, HyperLogLog.scala:404-431).
  * estimator: raw HLL harmonic mean with small-range linear counting
    only (initialEstimate, HyperLogLog.scala:253-267).
  * error = 1.04 / sqrt(2^p) (HyperLogLog.scala:240); approximateSize
    returns a +/-3-sigma interval at prob 0.9972 like algebird's
    ``asApproximate``.
  * intersection via inclusion-exclusion (HyperLogLog.scala:626-644) —
    accurate only for small numbers of sets.
  * serialization: sparse states stay sparse on the wire (tag byte like
    toBytes type 2=dense / 3=sparse, HyperLogLog.scala:158-216).

Vectorization: ``update_batch`` hashes whole int32/int64 numpy batches
with the murmur kernel and applies a sort-based grouped-max into the
registers — no per-row Python (SURVEY.md §4.1).
"""

from __future__ import annotations

import math

import numpy as np

from ..functions.hashing import DEFAULT_SEED, murmur64_any, trailing_zeros64
from .base import KIND_HLL, Approximate, Sketch, register


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def idx_rho(values: np.ndarray, p: int, m: int,
            seed: int = DEFAULT_SEED) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rank) derivation shared by HLL and the
    HLL-celled SketchMap (one definition so the estimators cannot
    drift; HyperLogLog.scala:93-122 j/rhoW split)."""
    h = murmur64_any(values, seed)
    idx = (h & np.uint64(m - 1)).astype(np.int64)
    w = h >> np.uint64(p)
    rho = trailing_zeros64(w).astype(np.int64) + 1
    np.minimum(rho, 64 - p + 1, out=rho)
    return idx, rho.astype(np.uint8)


def bits_for_error(err: float) -> int:
    """Smallest p with 1.04/sqrt(2^p) <= err (HyperLogLog.scala:245-251)."""
    if not 0.0 < err < 1.0:
        raise ValueError(f"relative error must be in (0, 1), got {err}")
    p = int(math.ceil(2.0 * math.log(1.04 / err) / math.log(2.0)))
    return max(p, 4)


class HLL(Sketch):
    KIND = KIND_HLL
    SPARSE_FACTOR = 16  # promote when nonzero*16 > m (HyperLogLog.scala:410)

    def __init__(self, p: int = 14, seed: int = DEFAULT_SEED):
        if not 4 <= p <= 24:
            raise ValueError(f"p must be in [4, 24], got {p}")
        self.p = p
        self.m = 1 << p
        self.seed = seed
        self.sparse: dict[int, int] | None = {}  # idx -> rho; None once dense
        self.registers: np.ndarray | None = None  # uint8[m] once dense

    # ------------------------------------------------------------------
    def _params(self) -> dict:
        return {"p": self.p, "seed": self.seed}

    @property
    def is_sparse(self) -> bool:
        return self.sparse is not None

    def _to_dense(self) -> None:
        if self.sparse is None:
            return
        regs = np.zeros(self.m, dtype=np.uint8)
        if self.sparse:
            idx = np.fromiter(self.sparse.keys(), dtype=np.int64, count=len(self.sparse))
            rho = np.fromiter(self.sparse.values(), dtype=np.uint8, count=len(self.sparse))
            regs[idx] = rho
        self.registers = regs
        self.sparse = None

    def _maybe_promote(self) -> None:
        if self.sparse is not None and len(self.sparse) * self.SPARSE_FACTOR > self.m:
            self._to_dense()

    # ------------------------------------------------------------------
    def _idx_rho(self, values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        return idx_rho(values, self.p, self.m, self.seed)

    @staticmethod
    def _grouped_max(idx: np.ndarray, rho: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(unique idx, max rho per idx) via one sort — faster than
        np.maximum.at for large batches."""
        key = (idx << 7) | rho.astype(np.int64)  # rho <= 61 < 128
        key.sort()
        uidx = key >> 7
        last = np.empty(len(key), dtype=bool)
        last[-1] = True
        np.not_equal(uidx[1:], uidx[:-1], out=last[:-1])
        return uidx[last], (key[last] & 127).astype(np.uint8)

    _CHUNK = 1 << 16  # hash + rho + sort working set stays in cache

    def update_batch(self, values) -> None:
        values = np.asarray(values)
        if values.size == 0:
            return
        for lo in range(0, values.shape[0], self._CHUNK):
            idx, rho = self._idx_rho(values[lo:lo + self._CHUNK])
            uidx, urho = self._grouped_max(idx, rho)
            if self.sparse is not None:
                sp = self.sparse
                for i, r in zip(uidx.tolist(), urho.tolist()):
                    if r > sp.get(i, 0):
                        sp[i] = r
                self._maybe_promote()
            else:
                regs = self.registers
                np.maximum(regs[uidx], urho, out=urho)
                regs[uidx] = urho

    # ------------------------------------------------------------------
    def merge_in_place(self, other: "HLL") -> "HLL":
        self.merge_check(other)
        if other.sparse is not None:
            if self.sparse is not None:
                sp = self.sparse
                for i, r in other.sparse.items():
                    if r > sp.get(i, 0):
                        sp[i] = r
                self._maybe_promote()
            else:
                if other.sparse:
                    idx = np.fromiter(other.sparse.keys(), dtype=np.int64)
                    rho = np.fromiter(other.sparse.values(), dtype=np.uint8)
                    np.maximum(self.registers[idx], rho, out=rho)
                    self.registers[idx] = rho
        else:
            self._to_dense()
            np.maximum(self.registers, other.registers, out=self.registers)
        return self

    # ------------------------------------------------------------------
    def _sum_and_zeros(self) -> tuple[float, int]:
        if self.sparse is not None:
            nz = len(self.sparse)
            s = float(np.sum(np.exp2(-np.fromiter(self.sparse.values(), dtype=np.float64, count=nz)))) if nz else 0.0
            zeros = self.m - nz
            return s + zeros, zeros
        regs = self.registers
        s = float(np.sum(np.exp2(-regs.astype(np.float64))))
        zeros = int(np.count_nonzero(regs == 0))
        return s, zeros

    def estimate(self) -> float:
        s, zeros = self._sum_and_zeros()
        e = _alpha(self.m) * self.m * self.m / s
        if e <= 2.5 * self.m and zeros > 0:
            return self.m * math.log(self.m / zeros)  # linear counting
        return e

    @property
    def error(self) -> float:
        return 1.04 / math.sqrt(self.m)

    def approximate_size(self) -> Approximate:
        est = self.estimate()
        d = 3.0 * self.error  # 3-sigma interval, prob 0.9972 like algebird
        return Approximate(max(0.0, est * (1 - d)), est, est * (1 + d), 0.9972)

    def present(self) -> float:
        return self.estimate()

    def cardinality(self) -> int:
        return int(round(self.estimate()))

    # ------------------------------------------------------------------
    def downsize(self, new_p: int) -> "HLL":
        """Exact reduction to fewer bits (HyperLogLog.scala:361-390).

        With low-bit indexing, old idx = new_idx | (extra << new_p); the
        dropped index bits are the bits directly above the new index, so
        the new rho is either the position of the lowest set dropped bit
        + 1, or (p - new_p) + old_rho when all dropped bits are zero.
        """
        if new_p > self.p:
            raise ValueError("can only downsize to fewer bits")
        if new_p == self.p:
            out = HLL(self.p, self.seed)
            return out.merge_in_place(self)
        out = HLL(new_p, self.seed)
        if self.sparse is not None:
            idx = np.fromiter(self.sparse.keys(), dtype=np.int64, count=len(self.sparse))
            rho = np.fromiter(self.sparse.values(), dtype=np.int64, count=len(self.sparse))
        else:
            idx = np.nonzero(self.registers)[0].astype(np.int64)
            rho = self.registers[idx].astype(np.int64)
        if len(idx) == 0:
            return out
        new_idx = idx & ((1 << new_p) - 1)
        extra = (idx >> new_p).astype(np.uint64)  # (p - new_p) dropped bits
        tz = trailing_zeros64(extra).astype(np.int64)
        drop = self.p - new_p
        new_rho = np.where(extra == 0, drop + rho, np.minimum(tz, drop - 1) + 1)
        uidx, urho = self._grouped_max(new_idx, new_rho.astype(np.uint8))
        out.sparse = dict(zip(uidx.tolist(), (int(r) for r in urho)))
        out._maybe_promote()
        return out

    @staticmethod
    def intersection_size(hlls: list["HLL"]) -> Approximate:
        """Inclusion-exclusion intersection (HyperLogLog.scala:626-644)."""
        if not hlls:
            return Approximate(0.0, 0.0, 0.0, 1.0)
        if len(hlls) == 1:
            return hlls[0].approximate_size()
        head, tail = hlls[0], hlls[1:]
        tail_int = HLL.intersection_size(tail)
        merged_tail = [h + head for h in tail]  # ∩(t_i ∪ head) == (∩ t_i) ∪ head
        inter_union = HLL.intersection_size(merged_tail)
        # inclusion-exclusion through the Approximate algebra: interval
        # subtraction takes low - right.high / high - right.low and the
        # probabilities multiply (Approximate.scala:96-118)
        raw = head.approximate_size() + tail_int - inter_union
        if raw.high < 0.0:  # bounds entirely negative: size is 0
            return Approximate(0.0, 0.0, 0.0, raw.prob)
        return raw.with_min(0.0)

    # ------------------------------------------------------------------
    def _payload(self) -> bytes:
        if self.sparse is not None:
            # canonical order: serialization must not depend on dict
            # insertion order or merges break byte-equality laws
            n = len(self.sparse)
            idx = np.fromiter(self.sparse.keys(), dtype=np.int32, count=n)
            rho = np.fromiter(self.sparse.values(), dtype=np.uint8, count=n)
            order = np.argsort(idx, kind="stable")
            return b"\x03" + idx[order].tobytes() + rho[order].tobytes()
        return b"\x02" + self.registers.tobytes()  # tag 2 = dense


@register(KIND_HLL)
def _decode_hll(params: dict, payload: bytes) -> HLL:
    out = HLL(params["p"], params["seed"])
    tag, body = payload[0], payload[1:]
    if tag == 2:
        out.registers = np.frombuffer(body, dtype=np.uint8).copy()
        if len(out.registers) != out.m:
            raise ValueError("dense HLL payload size mismatch")
        out.sparse = None
    elif tag == 3:
        # strict layout check: a truncated sparse payload must fail
        # loudly, not silently decode a subset of the registers
        if len(body) % 5:
            raise ValueError("sparse HLL payload size not a multiple "
                             "of the 5-byte (idx, rho) record")
        n = len(body) // 5
        idx = np.frombuffer(body[: 4 * n], dtype=np.int32)
        rho = np.frombuffer(body[4 * n:], dtype=np.uint8)
        if n and (idx.min() < 0 or idx.max() >= out.m):
            raise ValueError("sparse HLL register index out of range")
        out.sparse = dict(zip(idx.tolist(), rho.tolist()))
    else:
        raise ValueError(f"bad HLL payload tag {tag}")
    return out
