"""Round-5 tranche 13: geocode-unit.verifymatch-backfill.js — ten
'coffee' POIs share z12 tiles with 'place N' polygons they are NOT
actually inside (3 km offset), so their 'coffee place' stacks verify
at reduced relevance; the chunked-verify backfill must keep loading
candidates until it reaches the one POI that genuinely sits inside a
place named 'place'."""

import json

import pytest

from acceptance_util import _mk_spans, build_acceptance_index, point


def _round(x, d=5):
    m = 10 ** d
    return round(x * m) / m


@pytest.fixture(scope="module")
def backfill_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    tile12 = 0.087890625
    box = _round(tile12 / 12)
    rows = []
    left, bottom = 0.0, 0.0
    for i in range(10):
        right, top = _round(left + box), _round(bottom + box)
        place = [[left, bottom], [left, top], [right, top],
                 [right, bottom], [left, bottom]]
        rows.append((f"place.{i + 1}", _mk_spans([
            ("text", f"place {i + 1}", ""),
            ("geom", json.dumps({"type": "Polygon",
                                 "coordinates": [place]}), ""),
            ("center", f"{_round((left + right) / 2)},"
                       f"{_round((bottom + top) / 2)}", "")])))
        # POI ~3km north of the place's top-left corner: same z12 tile
        # neighborhood, NOT inside the polygon
        plat = _round(top + 0.027)
        rows.append((f"poi.{i + 1}", _mk_spans([
            ("text", "coffee", ""), ("geom", point(left, plat), ""),
            ("center", f"{left},{plat}", "")])))
        rows.append((f"place.{16 + i}", _mk_spans([
            ("text", f"other {i + 1}", ""),
            ("geom", json.dumps({"type": "Polygon", "coordinates": [[
                [left, plat], [left, _round(plat + box)],
                [right, _round(plat + box)], [right, plat],
                [left, plat]]]}), ""),
            ("center", f"{_round((left + right) / 2)},"
                       f"{_round(plat + box / 2)}", "")])))
        left = _round(right + tile12)
    rows.append(("poi.11111", _mk_spans([
        ("text", "coffee", ""), ("geom", point(-1, -1), ""),
        ("center", "-1,-1", "")])))
    rows.append(("place.22222", _mk_spans([
        ("text", "place", ""),
        ("geom", json.dumps({"type": "Polygon", "coordinates": [[
            [-2, -2], [-2, -0.5], [-0.5, -0.5], [-0.5, -2],
            [-2, -2]]]}), ""),
        ("center", "-1.25,-1.25", "")])))
    cfg = GeocoderConfig(layers={
        "place": LayerConfig("place", zoom=12),
        "poi": LayerConfig("poi", zoom=14)})
    return build_acceptance_index(rows, cfg)


def test_backfill_reaches_contained_poi(backfill_index):
    """'coffee place' → poi.11111 (the one coffee actually inside a
    place named 'place'), not any of the ten tile-coincident decoys
    (verifymatch-backfill.js:181-186)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(backfill_index, "coffee place", limit=1)
    assert res and res[0]["feature_id"] == "poi.11111"
