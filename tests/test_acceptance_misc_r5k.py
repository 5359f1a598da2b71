"""Round-5 tranche 11: geocode-unit.jp-numeric.test.js — a trailing
house number after a numeric-text street ('神明台三丁目5', with and
without the space) still resolves against the cluster instead of being
swallowed by the street's own numeral."""

import pytest

from acceptance_util import (_mk_spans, build_acceptance_index, multipoint,
                             tile_box, tile_center, tiles_poly)

C32 = tile_center(6, 32, 32)
CEN0 = f"{C32[0]},{C32[1]}"
B32 = tiles_poly(tile_box(6, 32, 32))


@pytest.fixture(scope="module")
def jp_numeric_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    cfg = GeocoderConfig(layers={
        "country": LayerConfig("country", zoom=6),
        "region": LayerConfig("region", zoom=6),
        "place": LayerConfig("place", zoom=6),
        "address": LayerConfig("address", zoom=6, geocoder_address=True),
    })
    return build_acceptance_index([
        ("country.1", _mk_spans([("text", "Japan", ""), ("geom", B32, ""),
                                 ("center", CEN0, "")])),
        ("region.1", _mk_spans([("text", "東京都", ""), ("geom", B32, ""),
                                ("center", CEN0, "")])),
        ("place.1", _mk_spans([("text", "羽村市", ""), ("geom", B32, ""),
                               ("center", CEN0, "")])),
        ("address.1", _mk_spans([("text", "神明台三丁目", ""),
                                 ("geom", multipoint(C32, C32), ""),
                                 ("center", CEN0, ""),
                                 ("addr_numbers", "3,5", "")])),
    ], cfg)


@pytest.mark.parametrize("q", ["神明台三丁目5", "神明台三丁目 5"])
def test_jp_numeric_trailing_number(jp_numeric_index, q):
    """jp-numeric.test.js:82-99."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(jp_numeric_index, q, limit=5)
    assert len(res) == 1
    assert res[0]["feature_id"] == "address.1"
    assert res[0]["address"] == "5"
