"""Vectorized numpy twin of Spark's XXH64 hash primitives.

Spark's ``xxhash64(...)`` expression (catalyst XXH64) is the standard
XXH64 algorithm: per column it folds the previous hash in as the seed
(42 to start) and applies the per-type primitive — ``hashInt`` for
IntegerType literals, ``hashLong`` for LongType, ``hashUnsafeBytes``
over UTF-8 bytes for StringType.  This module reproduces those three
primitives bit-identically on numpy uint64 lanes so the curation bus's
driver-decide tier can compute MinHash signatures WITHOUT a Spark job
(the one aggregation job the warm micro-batch still paid — VERDICT r11
item 6).  Bit-identity is differential-gated in pytest against the live
Spark expressions over ascii/unicode/boundary-length inputs.

Everything here derives from the public XXH64 specification (Yann
Collet, BSD) as mirrored by Spark's ``XXH64.java``.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)
_SEED = np.uint64(42)  # Spark's xxhash64 default seed

_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * _P2
    h = h ^ (h >> np.uint64(29))
    h = h * _P3
    h = h ^ (h >> np.uint64(32))
    return h



def _no_overflow(fn):
    def wrapped(*a, **kw):
        with np.errstate(over="ignore"):
            return fn(*a, **kw)
    wrapped.__doc__ = fn.__doc__
    wrapped.__name__ = fn.__name__
    return wrapped

@_no_overflow
def hash_long_np(v, seed) -> np.ndarray:
    """XXH64.hashLong: vectorized over ``v`` (uint64 array or scalar);
    ``seed`` may be a scalar or an array broadcastable against v."""
    v = np.asarray(v, dtype=np.uint64)
    seed = np.asarray(seed, dtype=np.uint64)
    h = seed + _P5 + np.uint64(8)
    k1 = _rotl(v * _P2, 31) * _P1
    h = _rotl(h ^ k1, 27) * _P1 + _P4
    return _fmix(h)


@_no_overflow
def hash_int_np(v, seed) -> np.ndarray:
    """XXH64.hashInt: the IntegerType primitive (4-byte input)."""
    v = np.asarray(v, dtype=np.uint64) & np.uint64(0xFFFFFFFF)
    seed = np.asarray(seed, dtype=np.uint64)
    h = seed + _P5 + np.uint64(4)
    h = h ^ (v * _P1)
    h = _rotl(h, 23) * _P2 + _P3
    return _fmix(h)


def _hash_bytes_one(b: bytes, seed: int) -> int:
    """Reference scalar XXH64 over a byte string — the ≥32-byte path
    and the differential baseline for the vectorized form."""
    with np.errstate(over="ignore"):
        return _hash_bytes_one_impl(b, seed)


def _hash_bytes_one_impl(b: bytes, seed: int) -> int:
    n = len(b)
    s = np.uint64(seed)
    i = 0
    if n >= 32:
        v1 = s + _P1 + _P2
        v2 = s + _P2
        v3 = s
        v4 = s - _P1
        while i + 32 <= n:
            for j, v in enumerate((v1, v2, v3, v4)):
                lane = np.uint64(int.from_bytes(b[i + 8 * j : i + 8 * j + 8], "little"))
                v = _rotl(v + lane * _P2, 31) * _P1
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 32
        h = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        for v in (v1, v2, v3, v4):
            h = (h ^ (_rotl(v * _P2, 31) * _P1)) * _P1 + _P4
    else:
        h = s + _P5
    h = h + np.uint64(n)
    while i + 8 <= n:
        lane = np.uint64(int.from_bytes(b[i : i + 8], "little"))
        h = _rotl(h ^ (_rotl(lane * _P2, 31) * _P1), 27) * _P1 + _P4
        i += 8
    if i + 4 <= n:
        lane = np.uint64(int.from_bytes(b[i : i + 4], "little"))
        h = _rotl(h ^ (lane * _P1), 23) * _P2 + _P3
        i += 4
    while i < n:
        h = _rotl(h ^ (np.uint64(b[i]) * _P5), 11) * _P1
        i += 1
    return int(_fmix(h))


@_no_overflow
def hash_bytes_np(items: list[bytes], seed: int = int(_SEED)) -> np.ndarray:
    """Vectorized XXH64 over a list of byte strings → uint64 array.

    The < 32-byte common case (every word 3-gram shingle) runs as masked
    numpy lane ops over a padded (n, 32) byte matrix; ≥ 32-byte items go
    through the scalar reference path (rare for shingles).  Bit-identical
    to Spark's ``xxhash64(string)`` by the differential gate."""
    n = len(items)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out
    lens = np.fromiter((len(b) for b in items), dtype=np.int64, count=n)
    big = lens >= 32
    if big.any():
        for idx in np.nonzero(big)[0]:
            out[idx] = _hash_bytes_one(items[idx], seed)
    small = ~big
    m = int(small.sum())
    if m == 0:
        return out
    sidx = np.nonzero(small)[0]
    slens = lens[sidx]
    # padded (m, 32) byte matrix; zero padding is never hashed because
    # every access below is masked by the true length
    buf = b"".join(items[i].ljust(32, b"\0") for i in sidx)
    mat = np.frombuffer(buf, dtype=np.uint8).reshape(m, 32)
    words = mat.view("<u8")  # (m, 4) little-endian 8-byte lanes
    s = np.uint64(seed)
    h = np.full(m, s + _P5, dtype=np.uint64) + slens.astype(np.uint64)
    nlanes = slens // 8
    for k in range(3):  # ≤ 3 full 8-byte lanes under 32 bytes
        mask = nlanes > k
        if not mask.any():
            break
        lane = words[:, k]
        hk = _rotl(h ^ (_rotl(lane * _P2, 31) * _P1), 27) * _P1 + _P4
        h = np.where(mask, hk, h)
    rem = slens - nlanes * 8
    nextw = words[np.arange(m), np.minimum(nlanes, 3)]
    has4 = rem >= 4
    if has4.any():
        lane4 = nextw & np.uint64(0xFFFFFFFF)
        h4 = _rotl(h ^ (lane4 * _P1), 23) * _P2 + _P3
        h = np.where(has4, h4, h)
    tail_off = np.where(has4, np.uint64(32), np.uint64(0))
    tail_n = np.where(has4, rem - 4, rem)
    for t in range(3):  # ≤ 3 tail bytes after the optional 4-byte lane
        mask = tail_n > t
        if not mask.any():
            break
        byte = (nextw >> (tail_off + np.uint64(8 * t))) & np.uint64(0xFF)
        ht = _rotl(h ^ (byte * _P5), 11) * _P1
        h = np.where(mask, ht, h)
    out[sidx] = _fmix(h)
    return out
