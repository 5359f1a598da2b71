"""Minimal WKB codec (no shapely in this environment).

Geometry model: plain dicts {"type": ..., "coordinates": ...} matching
GeoJSON, covering the 7 types carmen indexes
(/root/reference/lib/indexer/indexdocs.js:164-212): Point, MultiPoint,
LineString, MultiLineString, Polygon, MultiPolygon, GeometryCollection.

Geometry travels through the Dataset as a WKB `binary` column (Arrow
zero-copy); decode happens only inside the stages that need coordinates.
"""

from __future__ import annotations

import struct

_TYPE_CODES = {
    "Point": 1,
    "LineString": 2,
    "Polygon": 3,
    "MultiPoint": 4,
    "MultiLineString": 5,
    "MultiPolygon": 6,
    "GeometryCollection": 7,
}
_CODE_TYPES = {v: k for k, v in _TYPE_CODES.items()}


def _write_coords_ring(buf: bytearray, ring) -> None:
    buf += struct.pack("<I", len(ring))
    for pt in ring:
        buf += struct.pack("<dd", float(pt[0]), float(pt[1]))


def encode(geom: dict) -> bytes:
    buf = bytearray()
    _encode_into(buf, geom)
    return bytes(buf)


def _encode_into(buf: bytearray, geom: dict) -> None:
    gtype = geom["type"]
    buf += b"\x01"  # little-endian
    buf += struct.pack("<I", _TYPE_CODES[gtype])
    c = geom.get("coordinates")
    if gtype == "Point":
        buf += struct.pack("<dd", float(c[0]), float(c[1]))
    elif gtype == "LineString":
        _write_coords_ring(buf, c)
    elif gtype == "Polygon":
        buf += struct.pack("<I", len(c))
        for ring in c:
            _write_coords_ring(buf, ring)
    elif gtype == "MultiPoint":
        buf += struct.pack("<I", len(c))
        for pt in c:
            _encode_into(buf, {"type": "Point", "coordinates": pt})
    elif gtype == "MultiLineString":
        buf += struct.pack("<I", len(c))
        for line in c:
            _encode_into(buf, {"type": "LineString", "coordinates": line})
    elif gtype == "MultiPolygon":
        buf += struct.pack("<I", len(c))
        for poly in c:
            _encode_into(buf, {"type": "Polygon", "coordinates": poly})
    elif gtype == "GeometryCollection":
        geoms = geom["geometries"]
        buf += struct.pack("<I", len(geoms))
        for g in geoms:
            _encode_into(buf, g)
    else:
        raise ValueError(f"unsupported geometry type {gtype}")


def decode(data: bytes) -> dict:
    geom, _ = _decode_at(data, 0)
    return geom


def _decode_at(data: bytes, off: int) -> tuple[dict, int]:
    byte_order = data[off]
    endian = "<" if byte_order == 1 else ">"
    code = struct.unpack_from(f"{endian}I", data, off + 1)[0] & 0xFF
    gtype = _CODE_TYPES[code]
    off += 5

    def read_ring(o):
        n = struct.unpack_from(f"{endian}I", data, o)[0]
        o += 4
        pts = [list(struct.unpack_from(f"{endian}dd", data, o + 16 * i)) for i in range(n)]
        return pts, o + 16 * n

    if gtype == "Point":
        x, y = struct.unpack_from(f"{endian}dd", data, off)
        return {"type": gtype, "coordinates": [x, y]}, off + 16
    if gtype == "LineString":
        pts, off = read_ring(off)
        return {"type": gtype, "coordinates": pts}, off
    if gtype == "Polygon":
        n = struct.unpack_from(f"{endian}I", data, off)[0]
        off += 4
        rings = []
        for _ in range(n):
            ring, off = read_ring(off)
            rings.append(ring)
        return {"type": gtype, "coordinates": rings}, off
    if gtype in ("MultiPoint", "MultiLineString", "MultiPolygon"):
        n = struct.unpack_from(f"{endian}I", data, off)[0]
        off += 4
        parts = []
        for _ in range(n):
            sub, off = _decode_at(data, off)
            parts.append(sub["coordinates"])
        return {"type": gtype, "coordinates": parts}, off
    if gtype == "GeometryCollection":
        n = struct.unpack_from(f"{endian}I", data, off)[0]
        off += 4
        geoms = []
        for _ in range(n):
            sub, off = _decode_at(data, off)
            geoms.append(sub)
        return {"type": gtype, "geometries": geoms}, off
    raise ValueError(f"unsupported geometry code {code}")
