"""Bounding-box suite incl. antimeridian handling.

Behavior-parity with /root/reference/lib/util/bbox.js:27-187.
Boxes are [W, S, E, N] lists.
"""

from __future__ import annotations

import numpy as np

from ..geom.tile import lonlat_to_tile_f


def inside(coords, bbox) -> bool:
    return not (coords[0] < bbox[0] or coords[0] > bbox[2] or coords[1] < bbox[1] or coords[1] > bbox[3])


def inside_tile(bbox, zoom: int) -> list[int]:
    """bbox → [zoom, minX, minY, maxX, maxY] in tile coords
    (sphericalmercator.xyz semantics: floor of fractional tile range,
    with the max edge nudged in)."""
    n = int(2 ** zoom)
    x0, y1 = lonlat_to_tile_f(bbox[0], bbox[1], zoom)  # south-west → maxY
    x1, y0 = lonlat_to_tile_f(bbox[2], bbox[3], zoom)  # north-east → minY
    eps = 1e-9
    min_x = int(np.clip(np.floor(float(x0) + eps), 0, n - 1))
    max_x = int(np.clip(np.floor(float(x1) - eps) if float(x1) > float(x0) else np.floor(float(x1)), 0, n - 1))
    min_y = int(np.clip(np.floor(float(y0) + eps), 0, n - 1))
    max_y = int(np.clip(np.floor(float(y1) - eps) if float(y1) > float(y0) else np.floor(float(y1)), 0, n - 1))
    return [zoom, min_x, min_y, max(max_x, min_x), max(max_y, min_y)]


def intersect(b1, b2) -> bool:
    return not (b1[0] > b2[2] or b1[2] < b2[0] or b1[1] > b2[3] or b1[3] < b2[1])


def intersection(b1, b2):
    out = [max(b1[0], b2[0]), max(b1[1], b2[1]), min(b1[2], b2[2]), min(b1[3], b2[3])]
    return out if (out[2] > out[0] and out[3] > out[1]) else False


def clip_bbox(bbox):
    """Split AM-crossing box at ±179.9, keep the larger side (bbox.js:115-127)."""
    if bbox[0] < bbox[2]:
        return bbox
    bbox = list(bbox)
    if abs(bbox[0]) > abs(bbox[2]):
        bbox[0] = -179.9
    else:
        bbox[2] = 179.9
    return bbox


def am_decompose(bbox):
    if bbox[0] <= bbox[2]:
        return [list(bbox)]
    western = list(bbox)
    western[2] = 180
    eastern = list(bbox)
    eastern[0] = -180
    return [western, eastern]


def am_intersect(b1, b2) -> bool:
    return any(intersect(s1, s2) for s1 in am_decompose(b1) for s2 in am_decompose(b2))


def am_inside(coords, bbox) -> bool:
    if not (bbox[1] <= coords[1] <= bbox[3]):
        return False
    if bbox[0] <= bbox[2]:
        return bbox[0] <= coords[0] <= bbox[2]
    return coords[0] >= bbox[0] or coords[0] <= bbox[2]


def cross_antimeridian_bbox(geom_bbox_west, geom_bbox_east, bbox_total):
    """Pick the narrower of the AM-crossing vs PM-crossing interpretation
    (bbox.js:86-107), given the per-hemisphere extents."""
    bbox_east = geom_bbox_east
    bbox_west = geom_bbox_west
    am_bbox = [bbox_east[0], bbox_total[1], bbox_west[2], bbox_total[3]]
    pm_bbox = [bbox_west[0], bbox_total[1], bbox_east[2], bbox_total[3]]
    pm_width = bbox_east[2] + abs(bbox_west[0])
    am_width = (180 - bbox_east[0]) + (180 - abs(bbox_west[2]))
    return am_bbox if pm_width > am_width else pm_bbox
