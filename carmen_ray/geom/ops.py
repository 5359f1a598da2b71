"""Pure-numpy geometry kernels: point-in-polygon, distances, bboxes,
point-on-feature, nearest point on LineString.

Replaces what the reference gets from turf / vtquery / mapnik
(/root/reference/lib/geocoder/context.js, lib/geocoder/routablepoint.js)
— no shapely in this environment, and vectorized kernels suit
map_batches better anyway.
"""

from __future__ import annotations

import numpy as np

from ..util.proximity import haversine_miles


def geom_bbox(geom: dict) -> list[float]:
    """[w, s, e, n] of any geometry dict."""
    coords = _all_coords(geom)
    arr = np.asarray(coords, dtype=np.float64)
    return [float(arr[:, 0].min()), float(arr[:, 1].min()),
            float(arr[:, 0].max()), float(arr[:, 1].max())]


def _all_coords(geom: dict) -> list:
    t = geom["type"]
    c = geom.get("coordinates")
    if t == "Point":
        return [c]
    if t in ("MultiPoint", "LineString"):
        return list(c)
    if t in ("MultiLineString", "Polygon"):
        return [pt for part in c for pt in part]
    if t == "MultiPolygon":
        return [pt for poly in c for ring in poly for pt in ring]
    if t == "GeometryCollection":
        return [pt for g in geom["geometries"] if g for pt in _all_coords(g)]
    raise ValueError(t)


def point_in_ring(px: float, py: float, ring) -> bool:
    """Ray-casting even-odd test; ring = (n,2) array-like.

    Scalar loop under 64 vertices (numpy's per-call overhead dwarfs the
    math there); vectorized kernel above.
    """
    n = len(ring)
    if n < 64:
        inside = False
        j = n - 1
        for i in range(n):
            xi, yi = ring[i][0], ring[i][1]
            xj, yj = ring[j][0], ring[j][1]
            if (yi > py) != (yj > py):
                xint = (xj - xi) * (py - yi) / (yj - yi) + xi
                if px < xint:
                    inside = not inside
            j = i
        return inside
    ring = np.asarray(ring, dtype=np.float64)
    x = ring[:, 0]
    y = ring[:, 1]
    x2 = np.roll(x, -1)
    y2 = np.roll(y, -1)
    cond = (y > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = (x2 - x) * (py - y) / (y2 - y) + x
    crossings = np.count_nonzero(cond & (px < xint))
    return bool(crossings % 2)


def point_in_polygon(px: float, py: float, polygon) -> bool:
    """polygon = list of rings (first exterior, rest holes)."""
    if not polygon or not point_in_ring(px, py, polygon[0]):
        return False
    for hole in polygon[1:]:
        if point_in_ring(px, py, hole):
            return False
    return True


def point_in_geom(px: float, py: float, geom: dict) -> bool:
    t = geom["type"]
    if t == "Polygon":
        return point_in_polygon(px, py, geom["coordinates"])
    if t == "MultiPolygon":
        return any(point_in_polygon(px, py, poly) for poly in geom["coordinates"])
    if t == "GeometryCollection":
        return any(point_in_geom(px, py, g) for g in geom["geometries"] if g)
    return False


def points_in_ring_bulk(pts: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd test: pts (m,2) × ring (n,2) → bool (m,)."""
    px = pts[:, 0][:, None]
    py = pts[:, 1][:, None]
    x = ring[:, 0][None, :]
    y = ring[:, 1][None, :]
    x2 = np.roll(ring[:, 0], -1)[None, :]
    y2 = np.roll(ring[:, 1], -1)[None, :]
    cond = (y > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = (x2 - x) * (py - y) / (y2 - y) + x
    return (cond & (px < xint)).sum(axis=1) % 2 == 1


def dist_point_to_geom_miles(px: float, py: float, geom: dict) -> float:
    """Distance from a point to a geometry in miles; 0 if inside a polygon."""
    t = geom["type"]
    if t in ("Polygon", "MultiPolygon", "GeometryCollection") and point_in_geom(px, py, geom):
        return 0.0
    best = np.inf
    for seg in _segments(geom):
        d = _dist_point_segment_miles(px, py, seg)
        if d < best:
            best = d
    for pt in _isolated_points(geom):
        d = float(haversine_miles(px, py, pt[0], pt[1]))
        if d < best:
            best = d
    return float(best)


def _segments(geom: dict):
    t = geom["type"]
    c = geom.get("coordinates")
    if t == "LineString":
        yield from zip(c[:-1], c[1:])
    elif t == "Polygon":
        for ring in c:
            yield from zip(ring[:-1], ring[1:])
    elif t == "MultiLineString":
        for line in c:
            yield from zip(line[:-1], line[1:])
    elif t == "MultiPolygon":
        for poly in c:
            for ring in poly:
                yield from zip(ring[:-1], ring[1:])
    elif t == "GeometryCollection":
        for g in geom["geometries"]:
            if g:
                yield from _segments(g)


def _isolated_points(geom: dict):
    t = geom["type"]
    c = geom.get("coordinates")
    if t == "Point":
        yield c
    elif t == "MultiPoint":
        yield from c
    elif t == "GeometryCollection":
        for g in geom["geometries"]:
            if g:
                yield from _isolated_points(g)


def _dist_point_segment_miles(px, py, seg) -> float:
    (ax, ay), (bx, by) = seg
    # planar projection scaled by cos(lat) — adequate at the ~km scales
    # carmen cares about (vtquery radius is 1000 m)
    cos = np.cos(np.radians(py))
    apx = (px - ax) * cos
    apy = py - ay
    abx = (bx - ax) * cos
    aby = by - ay
    denom = abx * abx + aby * aby
    t = 0.0 if denom == 0 else max(0.0, min(1.0, (apx * abx + apy * aby) / denom))
    cx = ax + (bx - ax) * t
    cy = ay + (by - ay) * t
    return float(haversine_miles(px, py, cx, cy))


def nearest_point_on_multiline(px: float, py: float, lines) -> tuple[float, float]:
    """Nearest point on a MultiLineString, e6-rounded
    (routable points, /root/reference/lib/geocoder/routablepoint.js:15-85)."""
    best = (np.inf, (px, py))
    for line in lines:
        for seg in zip(line[:-1], line[1:]):
            (ax, ay), (bx, by) = seg
            cos = np.cos(np.radians(py))
            abx = (bx - ax) * cos
            aby = by - ay
            denom = abx * abx + aby * aby
            t = 0.0 if denom == 0 else max(0.0, min(1.0, ((px - ax) * cos * abx + (py - ay) * aby) / denom))
            cx = ax + (bx - ax) * t
            cy = ay + (by - ay) * t
            d = float(haversine_miles(px, py, cx, cy))
            if d < best[0]:
                best = (d, (cx, cy))
    cx, cy = best[1]
    return (round(cx * 1e6) / 1e6, round(cy * 1e6) / 1e6)


def center_of(geom: dict) -> tuple[float, float]:
    """Point-on-feature-ish center: bbox midpoint snapped inside for
    polygons (cf. indexdocs.js center verification — the reference uses
    point-on-feature when the given center isn't inside)."""
    t = geom["type"]
    if t == "Point":
        return float(geom["coordinates"][0]), float(geom["coordinates"][1])
    w, s, e, n = geom_bbox(geom)
    cx, cy = (w + e) / 2, (s + n) / 2
    if t in ("Polygon", "MultiPolygon"):
        if point_in_geom(cx, cy, geom):
            return cx, cy
        # walk candidate offsets until one lands inside
        for fx in (0.25, 0.75, 0.1, 0.9, 0.5):
            for fy in (0.25, 0.75, 0.1, 0.9, 0.5):
                qx = w + (e - w) * fx
                qy = s + (n - s) * fy
                if point_in_geom(qx, qy, geom):
                    return qx, qy
        # fall back to first vertex
        first = _all_coords(geom)[0]
        return float(first[0]), float(first[1])
    return cx, cy


def geom_bbox_am(geom: dict) -> list[float]:
    """Feature bbox with antimeridian handling (bbox.js
    crossAntimeridian): when the plain extent spans more than a
    hemisphere, split the geometry's coordinates at lon 0 (including
    prime-meridian segment crossings), build per-hemisphere extents,
    and return whichever of the AM-form ([E-hemi west, S, W-hemi east,
    N], W > E) or PM-form bbox is narrower. Non-crossing features get
    the plain extent."""
    bbox = geom_bbox(geom)
    if bbox[2] - bbox[0] <= 180.0:
        return bbox

    east: list[float] | None = None   # lon >= 0 extent [w, e]
    west: list[float] | None = None   # lon <= 0 extent [w, e]

    def feed(lon: float):
        nonlocal east, west
        if lon >= 0:
            east = [min(east[0], lon), max(east[1], lon)] if east else [lon, lon]
        if lon <= 0:
            west = [min(west[0], lon), max(west[1], lon)] if west else [lon, lon]

    for c in _all_coords(geom):
        feed(float(c[0]))
    # prime-meridian segment crossings contribute lon 0 to both sides
    for (x1, y1), (x2, y2) in _segments(geom):
        if (x1 < 0 < x2 or x2 < 0 < x1) and abs(x1 - x2) < 180:
            feed(0.0)
    if east is None or west is None:
        return bbox

    pm_width = east[1] + abs(west[0])
    am_width = (180 - east[0]) + (180 - abs(west[1]))
    if pm_width > am_width:
        return [east[0], bbox[1], west[1], bbox[3]]  # AM form, W > E
    return [west[0], bbox[1], east[1], bbox[3]]
