"""options.types filter, subtypes and reverse splitting — port of
/root/reference/test/acceptance/geocode-unit.types.test.js.

'china' features stacked country/region/place at tile 6/52/25 plus two
poi sources sharing geocoder_name 'poi' with different maxscores (cn
500, au 100) and a landmark scorerange [0.5, 1]: validation errors,
subtype filtering by the OWNING source's maxscore, type-order
invariance, and reverse context splitting/suppression.
"""

import pytest

from acceptance_util import (_mk_spans, build_acceptance_index, point,
                             tile_box, tile_center, tiles_poly)

CN = (113.65, 34.75)
AU = (152.94, -27.44)


@pytest.fixture(scope="module")
def types_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    b = tile_box(6, 52, 25)
    c = f"{CN[0]},{CN[1]}"
    rows = [
        ("country.1", _mk_spans([
            ("text", "china", ""), ("geom", tiles_poly(b), ""),
            ("center", c, ""), ("score", "25000", ""), ("stack", "cn", "")])),
        ("region.1", _mk_spans([
            ("text", "china", ""), ("geom", tiles_poly(b), ""),
            ("center", c, ""), ("score", "3500", ""), ("stack", "cn", "")])),
        ("place.1", _mk_spans([
            ("text", "china", ""), ("geom", tiles_poly(b), ""),
            ("center", c, ""), ("score", "2500", ""), ("stack", "cn", "")])),
        ("poi_cn.1", _mk_spans([
            ("text", "china lm", ""), ("geom", point(*CN), ""),
            ("center", c, ""), ("score", "500", ""), ("stack", "cn", "")])),
        ("poi_cn.2", _mk_spans([
            ("text", "china poi", ""), ("geom", point(*CN), ""),
            ("center", c, ""), ("score", "5", ""), ("stack", "cn", "")])),
        ("poi_cn.3", _mk_spans([
            ("text", "china poi (offset)", ""),
            ("geom", point(113.651, 34.75), ""),
            ("center", "113.651,34.75", ""), ("score", "5", ""),
            ("stack", "cn", "")])),
        ("poi_au.3", _mk_spans([
            ("text", "australia nonlandmark", ""), ("geom", point(*AU), ""),
            ("center", f"{AU[0]},{AU[1]}", ""), ("score", "50", "")])),
        ("poi_au.4", _mk_spans([
            ("text", "australia landmark", ""), ("geom", point(*AU), ""),
            ("center", f"{AU[0]},{AU[1]}", ""), ("score", "51", "")])),
        ("poi_au.5", _mk_spans([
            ("text", "china lm", ""), ("geom", point(*AU), ""),
            ("center", f"{AU[0]},{AU[1]}", ""), ("score", "51", "")])),
    ]
    cfg = GeocoderConfig(layers={
        "country": LayerConfig("country", zoom=6),
        "region": LayerConfig("region", zoom=6),
        "place": LayerConfig("place", zoom=6),
        "poi_cn": LayerConfig(
            "poi_cn", zoom=14, geocoder_name="poi",
            scoreranges={"landmark": (0.5, 1)}, minscore=0, maxscore=500,
            geocoder_stack=["cn"]),
        "poi_au": LayerConfig(
            "poi_au", zoom=14, geocoder_name="poi",
            scoreranges={"landmark": (0.5, 1)}, minscore=0, maxscore=100,
            geocoder_stack=["au"]),
    })
    return build_acceptance_index(rows, cfg)


@pytest.mark.parametrize("bad", ["asdf", []])
def test_types_must_be_nonempty_array(types_index, bad):
    from carmen_ray.geocode.engine import forward_one

    with pytest.raises(ValueError, match="options.types must be an array"):
        forward_one(types_index, "china", types=bad)


def test_unknown_type_errors(types_index):
    from carmen_ray.geocode.engine import forward_one

    with pytest.raises(ValueError, match=(
            'Type "asdf" is not a known type. Must be one of: '
            "country, region, place, poi, poi.landmark")):
        forward_one(types_index, "china", types=["asdf"])


def test_landmark_beats_poi(types_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(types_index, "china", types=["poi.landmark"])
    assert len(res) == 2
    assert res[0]["place_name"].split(",")[0] == "china lm"
    assert res[0]["feature_id"] == "poi.1"


def test_subtype_plus_parent_returns_all(types_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(types_index, "china", types=["poi.landmark", "poi"])
    assert len(res) == 4
    assert res[0]["place_name"].split(",")[0] == "china lm"


def test_parent_type_includes_landmarks(types_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(types_index, "china", types=["poi"])
    assert len(res) == 4
    assert res[0]["place_name"].split(",")[0] == "china lm"


def test_country_wins_without_filter(types_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(types_index, "china", limit=4)
    assert res[0]["feature_id"] == "country.1"
    assert len(res) == 4


def test_type_order_invariance(types_index):
    from carmen_ray.geocode.engine import forward_one

    r1 = forward_one(types_index, "china",
                     types=["poi", "region", "place", "poi.landmark",
                            "country"])
    r2 = forward_one(types_index, "china",
                     types=["region", "place", "poi.landmark", "country",
                            "poi"])
    assert r1 == r2
    assert r1[0]["feature_id"] == "country.1"


def test_types_place(types_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(types_index, "china", types=["place"])
    assert len(res) == 1
    assert res[0]["feature_id"] == "place.1"


def test_types_region_place(types_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(types_index, "china", types=["region", "place"])
    assert [r["feature_id"] for r in res] == ["region.1", "place.1"]


def test_reverse_no_filter_splits_context(types_index):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(types_index, *CN, split_context=True)
    assert len(res) == 4
    assert res[0]["feature_id"] == "poi.1"


def test_reverse_type_country(types_index):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(types_index, *CN, types=["country"],
                      split_context=True)
    assert len(res) == 1
    assert res[0]["feature_id"] == "country.1"


def test_reverse_country_place_suppresses_region(types_index):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(types_index, *CN, types=["country", "place"],
                      split_context=True)
    assert len(res) == 2
    assert res[0]["feature_id"] == "place.1"
    assert res[0]["context"] == ["region.1", "country.1"]
    assert res[1]["feature_id"] == "country.1"
    assert res[1]["context"] == []


def test_reverse_poi_keeps_full_context(types_index):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(types_index, *CN, types=["poi"], split_context=True)
    assert len(res) == 1
    assert res[0]["context"] == ["place.1", "region.1", "country.1"]


def test_reverse_poi_landmark_score_range(types_index):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(types_index, *CN, types=["poi.landmark"],
                      split_context=True)
    assert len(res) == 1
    assert res[0]["place_name"].split(",")[0] == "china lm"
    assert res[0]["context"] == ["place.1", "region.1", "country.1"]


def test_reverse_offset_point(types_index):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(types_index, 113.651, 34.75, split_context=True)
    assert len(res) == 4
    assert res[0]["place_name"].split(",")[0] == "china poi (offset)"


def test_reverse_offset_landmark_filter(types_index):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(types_index, 113.651, 34.75, types=["poi.landmark"],
                      split_context=True)
    assert len(res) == 1
    assert res[0]["place_name"].split(",")[0] == "china lm"


def test_reverse_offset_poi_both_filters(types_index):
    from carmen_ray.geocode.engine import reverse_one

    # poi + poi.landmark normalizes to plain poi → offset point wins
    for t in (["poi", "poi.landmark"], ["poi.landmark", "poi"]):
        res = reverse_one(types_index, 113.651, 34.75, types=t,
                          split_context=True)
        assert res[0]["place_name"].split(",")[0] == "china poi (offset)"


def test_reverse_multi_poi_limit(types_index):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(types_index, *CN, types=["poi"], limit=5)
    assert len(res) == 3
    assert res[0]["context"] == ["place.1", "region.1", "country.1"]
    assert res[1]["context"] == ["place.1", "region.1", "country.1"]
    assert res[0]["feature_id"] != res[1]["feature_id"]


def test_reverse_multi_landmark_limit(types_index):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(types_index, *CN, types=["poi.landmark"], limit=5)
    assert len(res) == 1
    assert res[0]["place_name"].split(",")[0] == "china lm"
    assert res[0]["context"] == ["place.1", "region.1", "country.1"]


def test_fwd_landmark_across_score_ranges(types_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(types_index, "china lm", types=["poi.landmark"])
    assert len(res) == 2
    ids = [r["feature_id"] for r in res]
    assert "poi.5" in ids
    texts = [r["place_name"].split(",")[0] for r in res]
    assert "china lm" in texts
