"""Score handling across indexes — port of
/root/reference/test/acceptance/geocode-unit.score.test.js.

Ghost (score −1) features are findable by exact query but always lose
to scored same-name features (and dedupe away); equal-relevance ties
break by hierarchy without scores and by score with them; id queries
return relevance 1.
"""

import pytest

from acceptance_util import _mk_spans, build_acceptance_index, point, tile_box, tile_center, tiles_poly


@pytest.fixture(scope="module")
def ghost_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    c = "0,0"
    rows = [
        ("place.1", _mk_spans([("text", "fairfax", ""),
                               ("geom", point(0, 0), ""), ("center", c, ""),
                               ("score", "100", "")])),
        ("place.2", _mk_spans([("text", "mclean", ""),
                               ("geom", point(0, 0), ""), ("center", c, ""),
                               ("score", "-1", "")])),
        ("place.3", _mk_spans([("text", "20003-2004", ""),
                               ("geom", point(0, 0), ""), ("center", c, ""),
                               ("score", "-1", "")])),
        ("place.4", _mk_spans([("text", "20009", ""),
                               ("geom", point(0, 0), ""), ("center", c, ""),
                               ("score", "100", "")])),
        ("place.5", _mk_spans([("text", "20009", ""),
                               ("geom", point(0, 0), ""), ("center", c, ""),
                               ("score", "-1", "")])),
    ]
    cfg = GeocoderConfig(layers={"place": LayerConfig("place", zoom=6)})
    return build_acceptance_index(rows, cfg)


def test_scored_feature(ghost_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(ghost_index, "fairfax", limit=1)
    assert res[0]["place_name"] == "fairfax"
    assert res[0]["feature_id"] == "place.1"


def test_ghost_feature_findable(ghost_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(ghost_index, "mclean", limit=1)
    assert res[0]["place_name"] == "mclean"
    assert res[0]["feature_id"] == "place.2"


def test_scored_beats_ghost_and_dedupes(ghost_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(ghost_index, "20009", limit=2)
    assert len(res) == 1
    assert res[0]["place_name"] == "20009"
    assert res[0]["feature_id"] == "place.4"


def test_exact_match_bests_score(ghost_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(ghost_index, "20003-2004", limit=1)
    assert res[0]["place_name"] == "20003-2004"
    assert res[0]["feature_id"] == "place.3"


@pytest.fixture(scope="module")
def hierarchy_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    def at_tile(x):
        lon, lat = tile_center(6, x, 32)
        return [("geom", point(lon, lat), ""), ("center", f"{lon},{lat}", "")]

    rows = [
        ("country.1", _mk_spans([("text", "china", "")] + at_tile(32))),
        ("province.1", _mk_spans([("text", "china", "")] + at_tile(34))),
        ("city.1", _mk_spans([("text", "china", "")] + at_tile(36))),
    ]
    cfg = GeocoderConfig(layers={
        "country": LayerConfig("country", zoom=6),
        "province": LayerConfig("province", zoom=6),
        "city": LayerConfig("city", zoom=6)})
    return build_acceptance_index(rows, cfg)


def test_hierarchy_breaks_scoreless_tie(hierarchy_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(hierarchy_index, "china", limit=1)
    assert res[0]["place_name"] == "china"
    assert res[0]["feature_id"] == "country.1"


@pytest.fixture(scope="module")
def scored_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    def at_tile(x):
        lon, lat = tile_center(6, x, 32)
        return [("geom", point(lon, lat), ""), ("center", f"{lon},{lat}", "")]

    rows = [
        ("country.1", _mk_spans([("text", "china", ""), ("score", "5", "")]
                                + at_tile(32))),
        ("province.2", _mk_spans([("text", "china", ""), ("score", "10", "")]
                                 + at_tile(34))),
        ("city.3", _mk_spans([("text", "china", ""), ("score", "6", "")]
                             + at_tile(36))),
    ]
    cfg = GeocoderConfig(layers={
        "country": LayerConfig("country", zoom=6),
        "province": LayerConfig("province", zoom=6),
        "city": LayerConfig("city", zoom=6)})
    return build_acceptance_index(rows, cfg)


def test_score_orders_tie(scored_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(scored_index, "china", limit=3, allow_dupes=True)
    assert [r["feature_id"] for r in res] == [
        "province.2", "city.3", "country.1"]


def test_score_tie_dedupes_by_name(scored_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(scored_index, "china", limit=3)
    assert len(res) == 1
    assert res[0]["feature_id"] == "province.2"


def test_id_query_relevance_one(scored_index):
    # geocode('country.1') routes through the id-query parser
    from carmen_ray.geocode.engine import hydrate_one

    row = scored_index.doc_index["country.1"]
    res = hydrate_one(scored_index, row)
    assert len(res) == 1
    assert res[0]["relevance"] == 1
