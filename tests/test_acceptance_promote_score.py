"""Squishy score inheritance promotes the nested stack — port of
/root/reference/test/acceptance/geocode-unit.promote-score.test.js.

Three 'Main St' addresses stack with three different 'georgia's
(region, inherit-score place, country); the one inside the
place-inside-identically-named-country gets the +0.01 squishy nudge
and wins at displayed relevance 1.
"""

import json

import pytest

from acceptance_util import _mk_spans, build_acceptance_index, multipoint


def _poly(coords):
    return json.dumps({"type": "Polygon", "coordinates": [coords]})


@pytest.fixture(scope="module")
def promote_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    rows = [
        ("country.1", _mk_spans([
            ("text", "usa", ""), ("center", "0,0", ""),
            ("score", "1000000", ""),
            ("geom", _poly([[-20, -20], [-20, 20], [20, 20], [20, -20],
                            [-20, -20]]), "")])),
        ("country.2", _mk_spans([
            ("text", "georgia", ""), ("center", "45,45", ""),
            ("score", "10", ""),
            ("geom", _poly([[40, 40], [40, 50], [50, 50], [50, 40],
                            [40, 40]]), "")])),
        ("region.1", _mk_spans([
            ("text", "georgia", ""), ("center", "0,0", ""),
            ("score", "50", ""),
            ("geom", _poly([[-20, -20], [-20, 20], [20, 20], [20, -20],
                            [-20, -20]]), "")])),
        ("place.1", _mk_spans([
            ("text", "georgia", ""), ("center", "45,45", ""),
            ("score", "1", ""),
            ("geom", _poly([[42, 42], [42, 48], [48, 48], [48, 42],
                            [42, 42]]), "")])),
        ("address.10", _mk_spans([
            ("text", "Main St", ""), ("center", "0,0", ""),
            ("geom", multipoint((0.0, 0.0)), ""),
            ("addr_numbers", "1", "")])),
        ("address.11", _mk_spans([
            ("text", "Main St", ""), ("center", "45,45", ""),
            ("geom", multipoint((45.0, 45.0)), ""),
            ("addr_numbers", "1", "")])),
        ("address.12", _mk_spans([
            ("text", "Main St", ""), ("center", "41,41", ""),
            ("geom", multipoint((41.0, 41.0)), ""),
            ("addr_numbers", "1", "")])),
    ]
    cfg = GeocoderConfig(layers={
        "country": LayerConfig("country", zoom=6),
        "region": LayerConfig("region", zoom=6),
        "place": LayerConfig("place", zoom=6, geocoder_inherit_score=True),
        "address": LayerConfig("address", zoom=14, geocoder_address=True),
    })
    return build_acceptance_index(rows, cfg)


def test_find_georgia(promote_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(promote_index, "georgia")
    assert res[0]["feature_id"] == "region.1"
    assert res[0]["relevance"] == 1.0


def test_squishy_address_first(promote_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(promote_index, "1 main st georgia", limit=5,
                      allow_dupes=True)
    addr = [r for r in res if r["feature_id"].startswith("address")]
    assert len(addr) == 3
    assert res[0]["feature_id"] == "address.11"
    assert res[0]["relevance"] == 1.0
