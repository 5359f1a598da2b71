"""Pure-Python hashes used across the engine.

- murmur3_32: MurmurHash3 x86 32-bit (public domain algorithm, Austin
  Appleby). Carmen hashes every phrase with murmur and keeps one byte
  (`phraseHash`, /root/reference/lib/text-processing/termops.js:372-374).
- fnv1a_32 / fnv1a_64: FNV-1a, used for term-frequency sharding keys
  (the north star calls for fnv1a-hashed term frequencies).

All are deterministic across processes (unlike Python's builtin hash()),
which matters for reproducible partition assignment in a distributed run.
"""

from __future__ import annotations

import numpy as np

_U32 = 0xFFFFFFFF
_U64 = 0xFFFFFFFFFFFFFFFF


def murmur3_32(data: bytes | str, seed: int = 0) -> int:
    """MurmurHash3 x86_32."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    length = len(data)
    n_blocks = length // 4
    h1 = seed & _U32
    c1 = 0xCC9E2D51
    c2 = 0x1B873593

    for i in range(n_blocks):
        k1 = int.from_bytes(data[i * 4 : i * 4 + 4], "little")
        k1 = (k1 * c1) & _U32
        k1 = ((k1 << 15) | (k1 >> 17)) & _U32
        k1 = (k1 * c2) & _U32
        h1 ^= k1
        h1 = ((h1 << 13) | (h1 >> 19)) & _U32
        h1 = (h1 * 5 + 0xE6546B64) & _U32

    tail = data[n_blocks * 4 :]
    k1 = 0
    if len(tail) >= 3:
        k1 ^= tail[2] << 16
    if len(tail) >= 2:
        k1 ^= tail[1] << 8
    if len(tail) >= 1:
        k1 ^= tail[0]
        k1 = (k1 * c1) & _U32
        k1 = ((k1 << 15) | (k1 >> 17)) & _U32
        k1 = (k1 * c2) & _U32
        h1 ^= k1

    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _U32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _U32
    h1 ^= h1 >> 16
    return h1


def phrase_hash(phrase: str) -> int:
    """One-byte phrase hash, bit-exact with termops.js:372-374:
    murmurhash-native's murmurHash(str, 'buffer')[0] = the MSB of
    murmur3_x86_32 over the JS 'binary' (charCode & 0xFF) encoding.
    Verified against the reference's getIndexableText fixtures
    (Main Street → 248, Main Street Lane → 255, …)."""
    data = bytes(ord(c) & 0xFF for c in phrase)
    return murmur3_32(data) >> 24


def fnv1a_32(data: bytes | str) -> int:
    if isinstance(data, str):
        data = data.encode("utf-8")
    h = 0x811C9DC5
    for b in data:
        h ^= b
        h = (h * 0x01000193) & _U32
    return h


def fnv1a_64(data: bytes | str) -> int:
    if isinstance(data, str):
        data = data.encode("utf-8")
    h = 0xCBF29CE484222325
    for b in data:
        h ^= b
        h = (h * 0x100000001B3) & _U64
    return h


def fnv1a_64_np(arr) -> np.ndarray:
    """Vectorized-ish FNV-1a over an iterable of strings → uint64 ndarray.

    Python loop over rows but byte-level work in C (int ops); fast enough
    for shard-key assignment. For very hot paths prefer
    pyarrow.compute.hash or polars' hash; this one is stable across
    releases which is what checkpoint lineage needs.
    """
    out = np.empty(len(arr), dtype=np.uint64)
    for i, s in enumerate(arr):
        out[i] = fnv1a_64(s if s is not None else b"")
    return out
