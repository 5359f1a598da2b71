"""Spatialmatch cell stacking + gappy stacks — ports of
/root/reference/test/acceptance/geocode-unit.spatialmatch.test.js and
geocode-unit.gappy.test.js.

spatialmatch: two 'fake street' address twins share tile 6/32/32 with
'fakecity'; the one holding address number 1 must win '1 fake street
fakecity' at relevance 1 — the highest relev for a stacked zxy cell is
kept, a lower-scoring cell may not overwrite a previous entry.

gappy: 'west st new york' style queries where the stack skips a layer
(street + province with no city token, street in one city vs another)
— spatialmatch.js gappy penalty + context sort.
"""

import pytest

from acceptance_util import (_mk_spans, build_acceptance_index, point,
                             multipoint, tile_box, tile_center, tiles_poly)


@pytest.fixture(scope="module")
def sm_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    b = tile_box(6, 32, 32)
    lon, lat = tile_center(6, 32, 32)
    rows = [
        ("place.1", _mk_spans([
            ("text", "fakecity", ""),
            ("geom", tiles_poly(b), ""),
            ("center", f"{lon},{lat}", "")])),
        # matching address: numbers '1', covers 6/32/32 and 6/32/33
        ("address.2", _mk_spans([
            ("text", "fake street", ""),
            ("geom", multipoint((lon, lat)), ""),
            ("center", f"{lon},{lat}", ""),
            ("addr_numbers", "1", "")])),
        # other address: number '2', same cell — must not overwrite
        ("address.3", _mk_spans([
            ("text", "fake street", ""),
            ("geom", multipoint((lon, lat)), ""),
            ("center", f"{lon},{lat}", ""),
            ("addr_numbers", "2", "")])),
    ]
    cfg = GeocoderConfig(layers={
        "place": LayerConfig("place", zoom=6),
        "address": LayerConfig("address", zoom=6, geocoder_address=True),
    })
    return build_acceptance_index(rows, cfg)


def test_spatialmatch_relev(sm_index):
    """'1 fake street fakecity' → address.2 at relevance 1
    (spatialmatch.test.js:72-79)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(sm_index, "1 fake street fakecity", limit=1)
    assert len(res) == 1
    assert res[0]["feature_id"] == "address.2"
    assert res[0]["relevance"] == 1


@pytest.fixture(scope="module")
def gappy_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    b3232 = tile_box(6, 32, 32)
    b3432 = tile_box(6, 34, 32)
    c32 = tile_center(6, 32, 32)
    c34 = tile_center(6, 34, 32)
    rows = [
        ("province.1", _mk_spans([
            ("text", "new york", ""), ("synonym", "ny", ""),
            ("geom", tiles_poly(b3232, b3432), ""),
            ("center", f"{c32[0]},{c32[1]}", "")])),
        ("city.1", _mk_spans([
            ("text", "new york", ""), ("synonym", "ny", ""),
            ("geom", tiles_poly(b3232), ""),
            ("center", f"{c32[0]},{c32[1]}", "")])),
        ("city.2", _mk_spans([
            ("text", "tonawanda", ""),
            ("geom", tiles_poly(b3432), ""),
            ("center", f"{c34[0]},{c34[1]}", "")])),
        ("street.1", _mk_spans([
            ("text", "west st", ""),
            ("geom", point(*c32), ""),
            ("center", f"{c32[0]},{c32[1]}", "")])),
        ("street.2", _mk_spans([
            ("text", "west st", ""),
            ("geom", point(*c34), ""),
            ("center", f"{c34[0]},{c34[1]}", "")])),
    ]
    cfg = GeocoderConfig(layers={
        "province": LayerConfig("province", zoom=6),
        "city": LayerConfig("city", zoom=6),
        "street": LayerConfig("street", zoom=6, geocoder_address=True),
    })
    return build_acceptance_index(rows, cfg)


def test_west_st_tonawanda_ny(gappy_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(gappy_index, "west st tonawanda ny", limit=1)
    assert res[0]["place_name"] == "west st, tonawanda, new york"


def test_west_st_new_york_ny(gappy_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(gappy_index, "west st new york ny", limit=1)
    assert res[0]["place_name"] == "west st, new york, new york"


def test_new_york_prefers_province(gappy_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(gappy_index, "new york", limit=1)
    assert res[0]["place_name"] == "new york"
    assert res[0]["feature_id"] == "province.1"


@pytest.mark.parametrize("q", ["new york new york", "ny ny", "new york ny"])
def test_city_province_stack_prefers_city(gappy_index, q):
    """limit_verify 2 cases: the city+province stack wins the context
    sort over province alone (gappy.test.js:113-136)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(gappy_index, q, limit=2)
    assert res[0]["place_name"] == "new york, new york"
    assert res[0]["feature_id"] == "city.1"
