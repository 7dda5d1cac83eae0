"""MinHash signatures for Jaccard similarity + LSH bucketing.

Semantics follow algebird-core .../MinHasher.scala:
  * monoid = element-wise minimum of hash lanes (plus, MinHasher.scala:79-80)
  * similarity = fraction of equal lanes (:83-86)
  * LSH buckets: split the signature into ``bands`` groups of ``rows``
    lanes, hash each group (:88-94); pick (bands, rows) for a target
    similarity threshold ~ (1/bands)^(1/rows) (:12-27).

Lanes are 64-bit: lane_i(x) = (a_i * h(x) + b_i) mod p (universal hash
over a murmur-mixed key), vectorized per lane over whole batches.
"""

from __future__ import annotations

import numpy as np

from ..functions.hashing import DEFAULT_SEED, affine_mod_p61, murmur64_any
from .base import KIND_MINHASH, Sketch, register

_P61 = np.uint64((1 << 61) - 1)  # Mersenne prime modulus


def pick_bands_rows(num_lanes: int, threshold: float) -> tuple[int, int]:
    """Maximize bands subject to estimated threshold >= target
    (MinHasher.scala:12-27 analog)."""
    best = (1, num_lanes)
    for rows in range(1, num_lanes + 1):
        bands = num_lanes // rows
        if bands < 1:
            break
        est = (1.0 / bands) ** (1.0 / rows)
        if est >= threshold:
            return bands, rows
        best = (bands, rows)
    return best


class MinHash(Sketch):
    KIND = KIND_MINHASH

    def __init__(self, num_lanes: int = 128, seed: int = DEFAULT_SEED):
        self.num_lanes = num_lanes
        self.seed = seed
        rng = np.random.default_rng(seed)
        self._a = rng.integers(1, int(_P61), size=num_lanes, dtype=np.int64).astype(np.uint64)
        self._b = rng.integers(0, int(_P61), size=num_lanes, dtype=np.int64).astype(np.uint64)
        self.sig = np.full(num_lanes, np.iinfo(np.uint64).max, dtype=np.uint64)

    def _params(self) -> dict:
        # hash_family: round 2 replaced uint64-wraparound (a*h+b)%p with
        # the exact Mersenne-61 mulmod; tag it so states persisted under
        # the old lane hash fail merge_check instead of merging silently
        # into wrong similarities.
        return {"num_lanes": self.num_lanes, "seed": self.seed,
                "hash_family": "mersenne61_v2"}

    def update_batch(self, values) -> None:
        values = np.asarray(values)
        if values.size == 0:
            return
        h = murmur64_any(values, self.seed) & _P61
        # per-lane min over the batch; loop over lanes (vector per lane).
        # affine_mod_p61 is the exact Mersenne-prime universal hash — a
        # plain (a*h + b) % p in uint64 wraps mod 2^64 first and loses
        # min-wise independence.
        for i in range(self.num_lanes):
            lane = affine_mod_p61(self._a[i], h, self._b[i])
            m = lane.min()
            if m < self.sig[i]:
                self.sig[i] = m

    def merge_in_place(self, other: "MinHash") -> "MinHash":
        self.merge_check(other)
        np.minimum(self.sig, other.sig, out=self.sig)
        return self

    def similarity(self, other: "MinHash") -> float:
        self.merge_check(other)
        return float(np.mean(self.sig == other.sig))

    def lsh_buckets(self, bands: int) -> list[int]:
        """One stable bucket id per band (band index mixed in)."""
        rows = self.num_lanes // bands
        out = []
        for b in range(bands):
            chunk = self.sig[b * rows : (b + 1) * rows]
            acc = np.uint64(1469598103934665603) ^ np.uint64(b)
            with np.errstate(over="ignore"):  # FNV wraps mod 2^64 by design
                for v in chunk:  # FNV-style fold, rows is small
                    acc = (acc ^ v) * np.uint64(1099511628211)
            out.append(int(acc & np.uint64(0x7FFFFFFFFFFFFFFF)))
        return out

    def present(self) -> list[int]:
        return self.sig.tolist()

    def _payload(self) -> bytes:
        return self.sig.tobytes()


@register(KIND_MINHASH)
def _decode_minhash(params: dict, payload: bytes) -> MinHash:
    out = MinHash(params["num_lanes"], params["seed"])
    out.sig = np.frombuffer(payload, dtype=np.uint64).copy()
    return out
