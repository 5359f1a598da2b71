"""Round-5 tranche 7: geocode-unit.translation-noauto.test.js — the
autocomplete prefix 'de' matches both the default 'Delaware' and the
Hungarian 'Dél-Karolina'; the out-of-request translation match takes
the cross-language relevance penalty, while a language=hu request
levels the field (Delaware is 'Delaware' in Hungarian too)."""

import pytest

from acceptance_util import (_mk_spans, build_acceptance_index, tile_box,
                             tile_center, tiles_poly)

C32 = tile_center(6, 32, 32)
CEN0 = f"{C32[0]},{C32[1]}"
B32 = tiles_poly(tile_box(6, 32, 32))


@pytest.fixture(scope="module")
def noauto_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    cfg = GeocoderConfig(layers={
        "region": LayerConfig("region", zoom=6,
                              geocoder_languages=["en", "hu"])})
    return build_acceptance_index([
        ("region.1", _mk_spans([
            ("text", "South Carolina", ""),
            ("lang:en", "South Carolina", ""),
            ("lang:hu", "Dél-Karolina", ""),
            ("geom", B32, ""), ("center", CEN0, "")])),
        ("region.2", _mk_spans([
            ("text", "Delaware", ""), ("lang:en", "Delaware", ""),
            ("lang:hu", "Delaware", ""),
            ("geom", B32, ""), ("center", CEN0, "")])),
    ], cfg)


@pytest.mark.parametrize("lang", [None, "en"])
def test_noauto_default_penalizes_translation(noauto_index, lang):
    """'de' → Delaware first at full relevance; Dél-Karolina second
    with the cross-language penalty (translation-noauto:53-90)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(noauto_index, "de", limit=5, language=lang)
    assert len(res) == 2
    assert res[0]["feature_id"] == "region.2"
    assert res[0]["place_name"] == "Delaware"
    assert res[1]["feature_id"] == "region.1"
    assert res[1]["place_name"] == "South Carolina"
    assert res[0]["relevance"] - res[1]["relevance"] > 0


@pytest.mark.parametrize("lang", ["hu", "hu-HU"])
def test_noauto_hu_levels_field(noauto_index, lang):
    """'de' with language=hu: both features match in-language at equal
    relevance — Delaware's Hungarian name is also 'Delaware', and SC
    displays 'Dél-Karolina' (translation-noauto:92-124). Documented
    divergence: the reference orders Delaware (id 2) first at this
    exact tie — the same carmen-core grid-iteration artifact as
    numeric.test.js's restaurant-first pin, which contradicts the
    id-ascending tie duplicate-address pins — so the pair + displays +
    the <0.1 relevance gap are the portable contract."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(noauto_index, "de", limit=5, language=lang)
    assert len(res) == 2
    by_id = {r["feature_id"]: r for r in res}
    assert by_id["region.2"]["place_name"] == "Delaware"
    assert by_id["region.1"]["place_name"] == "Dél-Karolina"
    assert abs(by_id["region.2"]["relevance"]
               - by_id["region.1"]["relevance"]) < 0.1


def test_noauto_full_names(noauto_index):
    """'delaware' / 'sou' / 'south carolina' each hit exactly one
    feature (translation-noauto:126-152)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(noauto_index, "delaware", limit=5)
    assert len(res) == 1 and res[0]["feature_id"] == "region.2"
    res = forward_one(noauto_index, "sou", limit=5)
    assert len(res) == 1 and res[0]["feature_id"] == "region.1"
    res = forward_one(noauto_index, "south carolina", limit=5)
    assert len(res) == 1 and res[0]["feature_id"] == "region.1"
