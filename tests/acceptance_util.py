"""Shared helpers for the acceptance-fixture ports.

The reference acceptance tests place features by `carmen:zxy` covers and
carmen's context lookup is tile-based (half-open tile intervals), so its
fixtures sit centers on exact tile corners. This engine derives covers
from geometry and context from PIP containment, so ports use the covered
tiles' BOXES as geometries and interior points as centers — the ranking
semantics under test are unchanged (divergence note, ROUNDLOG r5).
"""

from __future__ import annotations

import json
import math

import pyarrow as pa

from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans

__all__ = ["tile_box", "tile_center", "tiles_poly", "point", "multipoint",
           "build_acceptance_index", "_mk_spans", "SPAN_TYPE"]


def tile_box(z: int, x: int, y: int) -> tuple[float, float, float, float]:
    """(w, s, e, n) of web-mercator tile z/x/y."""
    n = 2 ** z
    lw = x / n * 360 - 180
    le = (x + 1) / n * 360 - 180
    ln_ = math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * y / n))))
    ls = math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * (y + 1) / n))))
    return lw, ls, le, ln_


def tile_center(z: int, x: int, y: int) -> tuple[float, float]:
    w, s, e, n = tile_box(z, x, y)
    return (w + e) / 2, (s + n) / 2


def tiles_poly(*boxes) -> str:
    """GeoJSON Polygon/MultiPolygon string over (w,s,e,n) boxes."""
    if len(boxes) == 1:
        w, s, e, n = boxes[0]
        return json.dumps({"type": "Polygon", "coordinates": [[
            [w, s], [e, s], [e, n], [w, n], [w, s]]]})
    return json.dumps({"type": "MultiPolygon", "coordinates": [
        [[[w, s], [e, s], [e, n], [w, n], [w, s]]] for w, s, e, n in boxes]})


def point(lon: float, lat: float) -> str:
    return json.dumps({"type": "Point", "coordinates": [lon, lat]})


def multipoint(*coords) -> str:
    return json.dumps({"type": "MultiPoint", "coordinates": [list(c) for c in coords]})


def build_acceptance_index(rows, cfg=None):
    """rows: [(doc_id, spans)] → IndexData via the real build pipeline."""
    import ray.data as rd

    from carmen_ray.geocode.engine import IndexData
    from carmen_ray.index.build import build_index

    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows]),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE))})
    idx = build_index(rd.from_arrow(tbl).repartition(1), config=cfg)
    return IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                     idx.layer_zooms, config=cfg)
