"""Slippy-map (zxy) tile math and geometry tile cover.

Replaces @mapbox/tile-cover + @mapbox/sphericalmercator in the reference
(/root/reference/lib/indexer/indexdocs.js:229-264 cover generation,
lib/geocoder/context.js:353-371 query-point cover). Pure numpy; covers
are the grid (x, y) coordinates the 14-bit grid encoding packs.
"""

from __future__ import annotations

import math

import numpy as np

from ..util.jsmath import js_round

MAX_LAT = 85.0511287798066


def lonlat_to_tile_f(lon, lat, z: int):
    """Fractional tile coords (vectorized)."""
    lon = np.clip(np.asarray(lon, dtype=np.float64), -180.0, 180.0)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_LAT, MAX_LAT)
    n = 2.0 ** z
    x = (lon / 360.0 + 0.5) * n
    s = np.sin(np.radians(lat))
    y = (0.5 - 0.25 * np.log((1 + s) / (1 - s)) / np.pi) * n
    return x, np.clip(y, 0.0, n)


def lonlat_to_tile(lon, lat, z: int):
    """Integer tile containing the point (floor semantics, tile-cover style).
    Scalar fast path (hot in per-result formatting); numpy for arrays."""
    n = int(2 ** z)
    if isinstance(lon, (int, float)) and isinstance(lat, (int, float)):
        lonc = min(180.0, max(-180.0, float(lon)))
        latc = min(MAX_LAT, max(-MAX_LAT, float(lat)))
        xf = (lonc / 360.0 + 0.5) * n
        s = math.sin(math.radians(latc))
        yf = (0.5 - 0.25 * math.log((1 + s) / (1 - s)) / math.pi) * n
        xi = min(n - 1, max(0, int(math.floor(xf))))
        yi = min(n - 1, max(0, int(math.floor(yf))))
        return xi, yi
    x, y = lonlat_to_tile_f(lon, lat, z)
    xi = np.clip(np.floor(x).astype(np.int64), 0, n - 1)
    yi = np.clip(np.floor(y).astype(np.int64), 0, n - 1)
    return xi, yi


def tile_to_lonlat(x, y, z: int):
    """NW corner of tile → (lon, lat)."""
    n = 2.0 ** z
    lon = np.asarray(x, dtype=np.float64) / n * 360.0 - 180.0
    lat = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * np.asarray(y, dtype=np.float64) / n))))
    return lon, lat


def tile_center_lonlat(x, y, z: int):
    return tile_to_lonlat(np.asarray(x, dtype=np.float64) + 0.5, np.asarray(y, dtype=np.float64) + 0.5, z)


def parse_zxy(s: str) -> tuple[int, int, int]:
    z, x, y = s.split("/")
    return int(z), int(x), int(y)


def format_zxy(z: int, x: int, y: int) -> str:
    return f"{z}/{x}/{y}"


def _line_tiles(coords, z: int) -> set[tuple[int, int]]:
    """All tiles crossed by a polyline — DDA walk in tile space."""
    tiles: set[tuple[int, int]] = set()
    xs, ys = lonlat_to_tile_f([p[0] for p in coords], [p[1] for p in coords], z)
    n = int(2 ** z)
    for i in range(len(coords) - 1):
        x0, y0, x1, y1 = float(xs[i]), float(ys[i]), float(xs[i + 1]), float(ys[i + 1])
        steps = max(1, int(math.ceil(max(abs(x1 - x0), abs(y1 - y0)) * 2)))
        for s in range(steps + 1):
            t = s / steps
            fx = x0 + (x1 - x0) * t
            fy = y0 + (y1 - y0) * t
            tiles.add((min(n - 1, max(0, int(fx))), min(n - 1, max(0, int(fy)))))
    return tiles


def _polygon_tiles(rings, z: int) -> set[tuple[int, int]]:
    """Edge tiles + interior fill (scanline between edge tiles per row)."""
    from .ops import point_in_polygon

    tiles: set[tuple[int, int]] = set()
    for ring in rings:
        tiles |= _line_tiles(ring, z)
    if not tiles:
        return tiles
    rows: dict[int, list[int]] = {}
    for x, y in tiles:
        rows.setdefault(y, []).append(x)
    filled = set(tiles)
    for y, xs_list in rows.items():
        xs_list.sort()
        for xa, xb in zip(xs_list[:-1], xs_list[1:]):
            if xb - xa <= 1:
                continue
            for x in range(xa + 1, xb):
                lon, lat = tile_center_lonlat(x, y, z)
                if point_in_polygon(float(lon), float(lat), rings):
                    filled.add((x, y))
    return filled


def cover(geom: dict, z: int, max_covers: int | None = 10000) -> list[tuple[int, int]]:
    """Tile cover of a geometry at zoom z, deterministic order (y, then x).

    The 10k-cover cap keeps the covers nearest the feature center, like
    indexdocs.js:346-358 truncates giant features.
    """
    t = geom["type"]
    tiles: set[tuple[int, int]]
    if t == "Point":
        x, y = lonlat_to_tile(geom["coordinates"][0], geom["coordinates"][1], z)
        tiles = {(int(x), int(y))}
    elif t == "MultiPoint":
        xs, ys = lonlat_to_tile([p[0] for p in geom["coordinates"]], [p[1] for p in geom["coordinates"]], z)
        tiles = set(zip(xs.tolist(), ys.tolist()))
    elif t == "LineString":
        tiles = _line_tiles(geom["coordinates"], z)
    elif t == "MultiLineString":
        tiles = set()
        for line in geom["coordinates"]:
            tiles |= _line_tiles(line, z)
    elif t == "Polygon":
        tiles = _polygon_tiles(geom["coordinates"], z)
    elif t == "MultiPolygon":
        tiles = set()
        for poly in geom["coordinates"]:
            tiles |= _polygon_tiles(poly, z)
    elif t == "GeometryCollection":
        tiles = set()
        for g in geom["geometries"]:
            if g:
                tiles |= set(cover(g, z, None))
    else:
        raise ValueError(f"unsupported geometry type {t}")

    out = sorted(tiles, key=lambda xy: (xy[1], xy[0]))
    if max_covers is not None and len(out) > max_covers:
        from .ops import center_of

        cx, cy = center_of(geom)
        cxf, cyf = lonlat_to_tile_f(cx, cy, z)
        out.sort(key=lambda xy: (xy[0] - float(cxf)) ** 2 + (xy[1] - float(cyf)) ** 2)
        out = out[:max_covers]
        out.sort(key=lambda xy: (xy[1], xy[0]))
    return out


def point_cover_with_neighbors(lon: float, lat: float, z: int, radius_tiles: int = 1) -> list[tuple[int, int]]:
    """Query-point cover + ring of neighbors (context.js:353-371 uses the
    containing tile plus adjacent tiles within the query radius)."""
    x, y = lonlat_to_tile(lon, lat, z)
    n = int(2 ** z)
    out = []
    for dx in range(-radius_tiles, radius_tiles + 1):
        for dy in range(-radius_tiles, radius_tiles + 1):
            tx, ty = int(x) + dx, int(y) + dy
            if 0 <= ty < n:
                out.append((tx % n, ty))
    return out


def scale_to_zoom(x, y, from_z: int, to_z: int):
    """Scale tile coords between zooms (spatialmatch stacks covers from
    different-zoom indexes by scaling to a common zoom)."""
    if to_z >= from_z:
        shift = to_z - from_z
        return np.asarray(x) << shift, np.asarray(y) << shift
    shift = from_z - to_z
    return np.asarray(x) >> shift, np.asarray(y) >> shift
