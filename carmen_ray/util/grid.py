"""Carmen 53-bit packed grid encoding, vectorized over numpy uint64.

Layout (cf. /root/reference/lib/util/grid.js:16-41 and
docs/index-structure.md:14-35):

    value = relev * 2^51 + score * 2^48 + y * 2^34 + x * 2^20 + id

    relev: 2 bits — (relev - 0.4) / 0.2 rounded, so {0.4,0.6,0.8,1.0}
    score: 3 bits — log-scaled score bucket 0..7
    x, y : 14 bits each — tile coords at the layer zoom
    id   : 20 bits — feature id % 2^20

The whole engine keeps grids as a uint64 column; encode/decode are numpy
kernels so map_batches stages stay vectorized.
"""

from __future__ import annotations

import numpy as np

MP51 = np.uint64(1) << np.uint64(51)
MP48 = np.uint64(1) << np.uint64(48)
MP34 = np.uint64(1) << np.uint64(34)
MP20 = np.uint64(1) << np.uint64(20)
MP14 = np.uint64(1) << np.uint64(14)


def encode(x, y, relev, score, fid) -> np.ndarray:
    """Vectorized encode. relev in [0.4, 1.0], score 0..7, id < 2^20."""
    x = np.asarray(x, dtype=np.uint64)
    y = np.asarray(y, dtype=np.uint64)
    fid = np.asarray(fid, dtype=np.uint64) % MP20
    relev = np.asarray(relev, dtype=np.float64)
    score = np.clip(np.asarray(score, dtype=np.int64), 0, 7).astype(np.uint64)
    # JS Math.round is half-up; (relev-0.4)/0.2 lands on exact halves only
    # at relev=0.5/0.7/0.9 where +inf rounding == floor(x+0.5).
    r = np.clip(np.floor((relev - 0.4) / 0.2 + 0.5), 0, 3).astype(np.uint64)
    return r * MP51 + score * MP48 + y * MP34 + x * MP20 + fid


def decode(grids) -> dict[str, np.ndarray]:
    """Vectorized decode → dict of columns (relev, score, x, y, id)."""
    g = np.asarray(grids, dtype=np.uint64)
    relev = 0.4 + (g // MP51).astype(np.float64) * 0.2
    score = ((g % MP51) // MP48).astype(np.uint8)
    y = ((g % MP48) // MP34).astype(np.uint32)
    x = ((g % MP34) // MP20).astype(np.uint32)
    fid = (g % MP20).astype(np.uint32)
    return {"relev": np.round(relev, 1), "score": score, "x": x, "y": y, "id": fid}


def feature_id(doc_id_num) -> np.ndarray:
    """tmpid space: id % 2^24 (termops.js:133-135)."""
    return np.abs(np.asarray(doc_id_num, dtype=np.int64)) % (1 << 24)
