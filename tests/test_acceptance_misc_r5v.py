"""Round-5 tranche 22: geocode-unit.proximity-squishy.test.js — with
proximity at the POI, the nearby low-scored 'Georgia Cafe' outranks
the far identically-named place/country pair (the squishy inheritance
between place and country must not bury the local result), and the
inheriting place still precedes its country."""

import json

import pytest

from acceptance_util import _mk_spans, build_acceptance_index, point


@pytest.fixture(scope="module")
def prox_squishy_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    cfg = GeocoderConfig(layers={
        "country": LayerConfig("country", zoom=6, minscore=0,
                               maxscore=1e6),
        "place": LayerConfig("place", zoom=6, geocoder_inherit_score=True,
                             minscore=0, maxscore=1e5),
        "poi": LayerConfig("poi", zoom=6, minscore=0, maxscore=1e4),
    })
    box = json.dumps({"type": "Polygon", "coordinates": [[
        [40, 40], [40, 50], [50, 50], [50, 40], [40, 40]]]})
    return build_acceptance_index([
        ("country.1", _mk_spans([
            ("text", "georgia", ""), ("geom", box, ""),
            ("center", "45,45", ""), ("score", "600", "")])),
        ("place.1", _mk_spans([
            ("text", "georgia", ""), ("geom", box, ""),
            ("center", "45,45", ""), ("score", "500", "")])),
        ("poi.1", _mk_spans([
            ("text", "Georgia Cafe", ""), ("geom", point(0, 0), ""),
            ("center", "0,0", ""), ("score", "1", "")])),
    ], cfg)


def test_proximity_beats_squishy(prox_squishy_index):
    """proximity-squishy.test.js:88-95."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(prox_squishy_index, "georgia", proximity=(0, 0),
                      limit=3)
    assert [r["feature_id"] for r in res] == ["poi.1", "place.1",
                                              "country.1"]


def test_category_terms_language_universal(ray_session):
    """geocode-unit.language-universal-categories.js: under a ru flag,
    default-text matches take the penalty but a geocoder_categories
    term ('coffee') is language-universal — relevance stays 1."""
    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import forward_one
    from acceptance_util import tile_box, tile_center, tiles_poly

    C30 = tile_center(6, 30, 30)
    cfg = GeocoderConfig(layers={
        "country": LayerConfig("country", zoom=6,
                               geocoder_languages=["en", "es", "ru",
                                                   "zh_Latn"],
                               geocoder_categories=["coffee"])})
    ix = build_acceptance_index([
        ("country.2", _mk_spans([
            ("text", "Russian Federation, Rossiyskaya Federatsiya,coffee",
             ""),
            ("lang:ru", "Российская Федерация", ""),
            ("lang:zh_Latn", "Elousi", ""),
            ("geom", tiles_poly(tile_box(6, 30, 30)), ""),
            ("center", f"{C30[0]},{C30[1]}", ""),
            ("stack", "ru", "")])),
    ], cfg)
    for q in ["russia", "rossiyskaya"]:
        res = forward_one(ix, q, limit=1, language="ru")
        assert res and res[0]["feature_id"] == "country.2"
        assert res[0]["relevance"] < 1, q
    res = forward_one(ix, "coffee", limit=1, language="ru")
    assert res and res[0]["feature_id"] == "country.2"
    assert res[0]["relevance"] >= 1
