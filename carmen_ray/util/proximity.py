"""Proximity / scoredist math, parity with /root/reference/lib/util/proximity.js.

All distances in miles (turf haversine, earth radius 6371.0088 km →
3958.761316 mi). Functions are numpy-vectorized so the coalesce and
verify stages can score whole candidate batches at once.
"""

from __future__ import annotations

import math

import numpy as np

from .. import constants
from .jsmath import js_round

# turf's earth radius: 6371008.8 m → miles
EARTH_RADIUS_MILES = 6371008.8 / 1609.344
TILE_SIZE = 256


def haversine_miles(lon1, lat1, lon2, lat2):
    """Great-circle distance in miles (turf/distance semantics)."""
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(a, dtype=np.float64)) for a in (lon1, lat1, lon2, lat2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    h = np.sin(dlat / 2) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2) ** 2
    return 2 * EARTH_RADIUS_MILES * np.arcsin(np.sqrt(h))


def _hav_scalar(lon1: float, lat1: float, lon2: float, lat2: float) -> float:
    la1, la2 = math.radians(lat1), math.radians(lat2)
    h = (math.sin((la2 - la1) / 2) ** 2
         + math.cos(la1) * math.cos(la2)
         * math.sin(math.radians(lon2 - lon1) / 2) ** 2)
    return 2 * EARTH_RADIUS_MILES * math.asin(math.sqrt(h))


def cover_dist_miles(plon: float, plat: float, clon: float, clat: float,
                     gx: float, gy: float, zoom: int) -> float:
    """min(center distance, furthest cover-tile-corner distance) — the
    attach_proximity bound as a math-module scalar fast path for the
    per-row verify loops (bit-identical to the numpy route: both use
    IEEE doubles through the same formula)."""
    best = _hav_scalar(plon, plat, clon, clat)
    nz = 2.0 ** zoom
    max_corner = 0.0
    for dx in (0.0, 1.0):
        for dy in (0.0, 1.0):
            lon_c = (gx + dx) / nz * 360.0 - 180.0
            lat_c = math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * (gy + dy) / nz))))
            d = _hav_scalar(plon, plat, lon_c, lat_c)
            if d > max_corner:
                max_corner = d
    return best if best < max_corner else max_corner


def tile_corner_lonlat(x, y, z):
    """Top-left corner of tile (x, y) at zoom z → (lon, lat).

    Spherical-mercator pixel math as in @mapbox/sphericalmercator `ll()`
    with a 256px tile: the corner pixel of the tile.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = np.float64(2.0) ** z
    lon = x / n * 360.0 - 180.0
    lat = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * y / n))))
    return lon, lat


def _haversine_scalar(lon1, lat1, lon2, lat2) -> float:
    """Pure-scalar haversine (math module) — numpy overhead dominates at
    n=1, and distance() runs per grid in the hot path."""
    rl1, rl2 = math.radians(lat1), math.radians(lat2)
    dlat = rl2 - rl1
    dlon = math.radians(lon2) - math.radians(lon1)
    h = math.sin(dlat / 2) ** 2 + math.cos(rl1) * math.cos(rl2) * math.sin(dlon / 2) ** 2
    return 2 * EARTH_RADIUS_MILES * math.asin(math.sqrt(h))


def distance(proximity, center, cover_x, cover_y, cover_zoom):
    """min(dist to center, dist to furthest cover corner), miles.

    cf. proximity.js:41-65 — for huge features the center may be far away;
    the cover tile bounds the true distance.
    """
    if proximity is None:
        return 0.0
    px, py = float(proximity[0]), float(proximity[1])
    center_dist = _haversine_scalar(px, py, float(center[0]), float(center[1]))
    n = 2.0 ** cover_zoom
    max_corner = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            lon = (cover_x + dx) / n * 360.0 - 180.0
            lat = math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * (cover_y + dy) / n))))
            d = _haversine_scalar(px, py, lon, lat)
            if d > max_corner:
                max_corner = d
    return min(center_dist, max_corner)


def center2zxy(lon: float, lat: float, z: int) -> tuple[int, int, int]:
    """lon/lat → [z, x, y] with carmen's clamp+round (proximity.js:74-82)."""
    lon = min(180.0, max(-180.0, lon))
    lat = min(85.0511, max(-85.0511, lat))
    n = 2.0 ** z
    xf = (lon / 360.0 + 0.5) * n
    s = math.sin(math.radians(lat))
    yf = (0.5 - 0.25 * math.log((1 + s) / (1 - s)) / math.pi) * n
    # sphericalmercator clamps pixel coords to the world extent
    xf = min(max(xf, 0.0), n)
    yf = min(max(yf, 0.0), n)
    return z, int(js_round(xf)), int(js_round(yf))


_VARIANCE_CONSTANT = -0.5 * (0.75 ** 2) / math.log(0.5)


def variance(scale: float, decay: float) -> float:
    if decay == 0:
        raise ValueError("decay must be > 0")
    return -0.5 * (scale ** 2) / math.log(decay)


def gauss(n_dist, var, offset=0.0):
    n = np.maximum(0.0, np.asarray(n_dist, dtype=np.float64) - offset)
    return np.exp(-0.5 * n ** 2 / var)


def scale_radius(zoom: int) -> float:
    if zoom <= 6:
        return float(constants.Z6_PROXIMITY_RADIUS)
    if zoom <= 12:
        return float(constants.Z12_PROXIMITY_RADIUS)
    return float(constants.Z14_PROXIMITY_RADIUS)


def score_weight(score, min_score, max_score):
    rng = max_score - min_score
    if rng == 0:
        rng = 1.0  # degenerate single-score corpus; reference divides by 0 → NaN only when min==max never happens (global max>min)
    normalized = (np.asarray(score, dtype=np.float64) - min_score) / rng
    return normalized * 499.0 + 1.0


def dist_weight(dist, zoom, radius=None):
    r = radius if radius else scale_radius(zoom)
    dist_ratio = np.asarray(dist, dtype=np.float64) / r
    return 9.0 * gauss(dist_ratio * 3.0, _VARIANCE_CONSTANT) + 1.0


def scoredist(score, min_score, max_score, dist, zoom, radius=None):
    """proximity.js:95-132 — scoreWeight(1..500) × distWeight(1..10)."""
    return dist_weight(dist, zoom, radius) * score_weight(score, min_score, max_score)


def distscore(dist, score):
    """Reverse-result distance-adjusted score (proximity.js:192-198)."""
    min_distance = 35.0
    distance_scale = 1000.0
    precision = 1.0e4
    v = np.asarray(score, dtype=np.float64) * (distance_scale / np.maximum(np.asarray(dist, dtype=np.float64), min_distance))
    return np.floor(v * precision + 0.5) / precision


def relevance_score(relev, scoredist_val, address=None, ghost=False):
    """0.6·relev + 0.4·scaled-scoredist with null-address/ghost penalties
    (proximity.js:212-222)."""
    relev = float(relev)
    if address is None:
        relev = max(0.0, relev - 0.0008)
    if ghost:
        relev = max(0.0, relev - 0.01)
    score_dist_weight = ((float(scoredist_val) - 1.0) / (5000.0 - 1.0)) * 0.4
    return relev * 0.6 + score_dist_weight
