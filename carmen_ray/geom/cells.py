"""Hierarchical cell indexes: S2 (from scratch) and an H3-shaped hex grid.

The north star asks that every media_ref-bearing span be encoded to H3
(res 7-9) and S2 cells alongside the carmen zxy grid.

S2: full quadratic-projection cube-face Hilbert-curve cell ids,
implemented from the published S2 geometry description (faces 0-5, u/v →
s/t quadratic transform, 30-level Hilbert position, 64-bit id =
face(3 bits) · position(2·level bits) · sentinel-1). Validated by
structural invariants in tests (parent containment, sibling distinctness,
round-trip level extraction).

H3: the real H3 icosahedral grid needs the gnomonic face tables; the
`h3` package is not installed here, so `hex_cell` is a deterministic
axial hex binning on web-mercator with H3-like average edge lengths per
resolution, packed into a uint64 with the resolution in the top bits.
When `import h3` succeeds we use the genuine library instead (gated
below) — same column contract either way.
"""

from __future__ import annotations

import math

import numpy as np

try:  # pragma: no cover - not installed in this environment
    import h3 as _h3
except ImportError:
    _h3 = None

# ---------------------------------------------------------------- S2 ---

_POS_TO_IJ = (
    (0, 1, 3, 2),  # canonical order
    (0, 2, 3, 1),  # swap
    (3, 2, 0, 1),  # invert
    (3, 1, 0, 2),  # swap + invert
)
_IJ_TO_POS = tuple(
    tuple(row.index(ij) for ij in range(4)) for row in _POS_TO_IJ
)
_POS_TO_ORIENTATION = (1, 0, 0, 3)  # swap, none, none, swap|invert
_SWAP_MASK = 1
_MAX_LEVEL = 30


def _lonlat_to_xyz(lon: float, lat: float) -> tuple[float, float, float]:
    phi = math.radians(lat)
    theta = math.radians(lon)
    cosphi = math.cos(phi)
    return math.cos(theta) * cosphi, math.sin(theta) * cosphi, math.sin(phi)


def _xyz_to_face_uv(x: float, y: float, z: float) -> tuple[int, float, float]:
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax >= ay and ax >= az:
        face = 0 if x > 0 else 3
    elif ay >= az:
        face = 1 if y > 0 else 4
    else:
        face = 2 if z > 0 else 5
    if face == 0:
        u, v = y / x, z / x
    elif face == 1:
        u, v = -x / y, z / y
    elif face == 2:
        u, v = -x / z, -y / z
    elif face == 3:
        u, v = z / x, y / x
    elif face == 4:
        u, v = z / y, -x / y
    else:
        u, v = -y / z, -x / z
    return face, u, v


def _uv_to_st(u: float) -> float:
    """Quadratic projection (the S2_QUADRATIC_PROJECTION default)."""
    if u >= 0:
        return 0.5 * math.sqrt(1 + 3 * u)
    return 1 - 0.5 * math.sqrt(1 - 3 * u)


def _st_to_ij(s: float) -> int:
    return max(0, min((1 << _MAX_LEVEL) - 1, int(math.floor(s * (1 << _MAX_LEVEL)))))


def s2_cell(lon: float, lat: float, level: int) -> int:
    """64-bit S2 cell id at `level` containing (lon, lat)."""
    face, u, v = _xyz_to_face_uv(*_lonlat_to_xyz(lon, lat))
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))

    orientation = face & _SWAP_MASK
    pos = 0
    for k in range(_MAX_LEVEL - 1, -1, -1):
        i_bit = (i >> k) & 1
        j_bit = (j >> k) & 1
        p = _IJ_TO_POS[orientation][(i_bit << 1) | j_bit]
        pos = (pos << 2) | p
        orientation ^= _POS_TO_ORIENTATION[p]

    cell_id = (face << 61) | (pos << 1) | 1  # leaf id
    # truncate to level: keep 3 + 2*level bits, set sentinel bit below them
    if level < _MAX_LEVEL:
        lsb = 1 << (2 * (_MAX_LEVEL - level))
        cell_id = (cell_id & ~(lsb - 1)) | lsb
    return cell_id


def s2_level(cell_id: int) -> int:
    """Level from trailing-one position."""
    lsb = cell_id & (~cell_id + 1)
    return _MAX_LEVEL - (lsb.bit_length() - 1) // 2


def s2_parent(cell_id: int, level: int) -> int:
    lsb = 1 << (2 * (_MAX_LEVEL - level))
    return (cell_id & ~(lsb - 1)) | lsb


_IJ_TO_POS_ARR = np.array(_IJ_TO_POS, dtype=np.uint64)        # [orient, (i<<1)|j]
_POS_TO_ORIENT_ARR = np.array(_POS_TO_ORIENTATION, dtype=np.uint64)


def s2_cells(lons, lats, level: int) -> np.ndarray:
    """Bulk S2 cells → uint64 array. Fully vectorized: face/uv/st in
    numpy passes, the 30-level Hilbert walk as 30 table-lookup passes
    over the whole batch. Bit-identical to `s2_cell` per element
    (pinned in tests)."""
    lon = np.asarray(lons, dtype=np.float64)
    lat = np.asarray(lats, dtype=np.float64)
    if lon.size == 0:
        return np.empty(0, dtype=np.uint64)
    phi = np.radians(lat)
    theta = np.radians(lon)
    cosphi = np.cos(phi)
    x, y, z = np.cos(theta) * cosphi, np.sin(theta) * cosphi, np.sin(phi)

    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (ax >= ay) & (ax >= az), np.where(x > 0, 0, 3),
        np.where(ay >= az, np.where(y > 0, 1, 4), np.where(z > 0, 2, 5)),
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [y / x, -x / y, -x / z, z / x, z / y], default=-y / z)
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [z / x, z / y, -y / z, y / x, -x / y], default=-x / z)

    def st(w):
        # both branches evaluate; the unselected one may sqrt a negative
        with np.errstate(invalid="ignore"):
            return np.where(w >= 0, 0.5 * np.sqrt(1 + 3 * w), 1 - 0.5 * np.sqrt(1 - 3 * w))

    scale = float(1 << _MAX_LEVEL)
    lim = (1 << _MAX_LEVEL) - 1
    i = np.clip(np.floor(st(u) * scale), 0, lim).astype(np.uint64)
    j = np.clip(np.floor(st(v) * scale), 0, lim).astype(np.uint64)

    face = face.astype(np.uint64)
    orientation = face & np.uint64(_SWAP_MASK)
    pos = np.zeros(lon.shape, dtype=np.uint64)
    one = np.uint64(1)
    for k in range(_MAX_LEVEL - 1, -1, -1):
        kk = np.uint64(k)
        ij = (((i >> kk) & one) << one) | ((j >> kk) & one)
        p = _IJ_TO_POS_ARR[orientation, ij]
        pos = (pos << np.uint64(2)) | p
        orientation ^= _POS_TO_ORIENT_ARR[p]

    cell = (face << np.uint64(61)) | (pos << one) | one
    if level < _MAX_LEVEL:
        lsb = np.uint64(1 << (2 * (_MAX_LEVEL - level)))
        cell = (cell & ~(lsb - one)) | lsb
    return cell


# --------------------------------------------------------- hex (H3ish) ---

# Average hex edge length (km) per H3 resolution (published H3 table).
_HEX_EDGE_KM = {
    0: 1107.712591, 1: 418.6760055, 2: 158.2446558, 3: 59.81085794,
    4: 22.6063794, 5: 8.544408276, 6: 3.229482772, 7: 1.220629759,
    8: 0.461354684, 9: 0.174375668, 10: 0.065907807, 11: 0.024910561,
    12: 0.009415526, 13: 0.003559893, 14: 0.001348575, 15: 0.000509713,
}
_EARTH_CIRCUM_KM = 40075.016686
_SQRT3 = math.sqrt(3.0)


def hex_cell(lon: float, lat: float, res: int) -> int:
    """H3-shaped hierarchical hex id (uint64) at resolution `res`.

    Uses the real `h3` library when available; otherwise a deterministic
    pointy-top axial hex binning on the web-mercator plane with the H3
    average edge length for `res`. Packing: res in bits 56-59, axial q/r
    (two's-complement 28 bits each) below — collision-free for |q|,|r| <
    2^27 which covers the globe at every res ≥ 0.
    """
    if _h3 is not None:
        return int(_h3.str_to_int(_h3.latlng_to_cell(lat, lon, res)))

    edge_km = _HEX_EDGE_KM[res]
    # mercator x in [0,1); y in (0,1) clipped; % 1 wraps lon=±180 to one seam
    x = (lon / 360.0 + 0.5) % 1.0
    latc = max(-85.0511287798066, min(85.0511287798066, lat))
    s = math.sin(math.radians(latc))
    y = 0.5 - 0.25 * math.log((1 + s) / (1 - s)) / math.pi
    # world units: fraction of circumference; hex size in same units
    size = edge_km / _EARTH_CIRCUM_KM
    # pointy-top axial coords
    q = (_SQRT3 / 3 * x - 1.0 / 3 * y) / size
    r = (2.0 / 3 * y) / size
    qi, ri = _axial_round(q, r)
    return (res & 0xF) << 56 | ((qi & 0xFFFFFFF) << 28) | (ri & 0xFFFFFFF)


def _axial_round(q: float, r: float) -> tuple[int, int]:
    """Cube-coordinate rounding."""
    x, z = q, r
    y = -x - z
    rx, ry, rz = round(x), round(y), round(z)
    dx, dy, dz = abs(rx - x), abs(ry - y), abs(rz - z)
    if dx > dy and dx > dz:
        rx = -ry - rz
    elif dy <= dz:
        rz = -rx - ry
    return int(rx), int(rz)


def hex_cells(lons, lats, res: int) -> np.ndarray:
    """Bulk hex cells → uint64, vectorized (bit-identical to `hex_cell`
    per element; falls back to the h3 library loop when installed)."""
    lon = np.asarray(lons, dtype=np.float64)
    lat = np.asarray(lats, dtype=np.float64)
    if _h3 is not None:  # pragma: no cover - h3 not installed here
        out = np.empty(len(lon), dtype=np.uint64)
        for idx in range(len(lon)):
            out[idx] = hex_cell(float(lon[idx]), float(lat[idx]), res)
        return out
    if lon.size == 0:
        return np.empty(0, dtype=np.uint64)

    edge_km = _HEX_EDGE_KM[res]
    x = (lon / 360.0 + 0.5) % 1.0
    latc = np.clip(lat, -85.0511287798066, 85.0511287798066)
    s = np.sin(np.radians(latc))
    y = 0.5 - 0.25 * np.log((1 + s) / (1 - s)) / math.pi
    size = edge_km / _EARTH_CIRCUM_KM
    q = (_SQRT3 / 3 * x - 1.0 / 3 * y) / size
    r = (2.0 / 3 * y) / size

    # cube rounding (matches _axial_round: round-half-even like python round)
    cx, cz = q, r
    cy = -cx - cz
    rx, ry, rz = np.round(cx), np.round(cy), np.round(cz)
    dx, dy, dz = np.abs(rx - cx), np.abs(ry - cy), np.abs(rz - cz)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dy <= dz)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    qi = rx.astype(np.int64)
    ri = rz.astype(np.int64)
    packed = (np.int64((res & 0xF)) << np.int64(56)) \
        | ((qi & np.int64(0xFFFFFFF)) << np.int64(28)) \
        | (ri & np.int64(0xFFFFFFF))
    return packed.astype(np.uint64)
