"""Round-5 tranche 6: geocode-unit.language-flag-bogus.test.js — a
reverse query with a language flag picks the requested translation,
and a bogus REGION subtag ('es-XX' / 'en-XX') falls back to its base
language rather than erroring or dropping to the default text."""

import pytest

from acceptance_util import (_mk_spans, build_acceptance_index, tile_box,
                             tile_center, tiles_poly)

C32 = tile_center(6, 32, 32)
B32 = tiles_poly(tile_box(6, 32, 32))


@pytest.fixture(scope="module")
def bogus_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    cfg = GeocoderConfig(layers={
        "country": LayerConfig("country", zoom=6,
                               geocoder_languages=["en", "es"])})
    return build_acceptance_index([
        ("country.1", _mk_spans([
            ("text", "United States", ""),
            ("lang:es", "Estados Unidos", ""),
            ("lang:en", "United States", ""),
            ("geom", B32, ""), ("center", f"{C32[0]},{C32[1]}", "")])),
    ], cfg)


@pytest.mark.parametrize("lang,expected_name,expected_lang", [
    ("en", "United States", "en"),
    ("es", "Estados Unidos", "es"),
    ("es-XX", "Estados Unidos", "es"),
    ("en-XX", "United States", "en"),
])
def test_reverse_language_flag_bogus_subtag(bogus_index, lang,
                                            expected_name, expected_lang):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(bogus_index, C32[0], C32[1], limit=1, language=lang)
    assert res and res[0]["feature_id"] == "country.1"
    assert res[0]["place_name"] == expected_name
    assert res[0]["language"] == expected_lang
