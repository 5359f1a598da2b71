"""Permutation bitmasks, parity with /root/reference/lib/util/permute.js:41-67.

`all(n)` — every non-zero n-bit mask, sorted by (popcount desc, value asc).
`continuous(n)` — the full mask plus every contiguous run of bits, in the
reference's emission order (full cover first, then shrinking windows slid
left-to-right). Order matters: getIndexablePhrases iterates these in order
and dedupes first-wins after a stable relevance sort.
"""

from __future__ import annotations

from functools import lru_cache


@lru_cache(maxsize=64)
def all_masks(length: int) -> tuple[int, ...]:
    masks = list(range((1 << length) - 1, 0, -1))
    masks.sort(key=lambda m: (-bin(m).count("1"), m))
    return tuple(masks)


@lru_cache(maxsize=64)
def continuous_masks(length: int) -> tuple[int, ...]:
    masks = []
    cover = (1 << length) - 1
    masks.append(cover)
    for i in range(1, length):
        cover >>= 1
        for j in range(i + 1):
            masks.append(cover << j)
    return tuple(masks)
