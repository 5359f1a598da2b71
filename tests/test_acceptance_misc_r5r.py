"""Round-5 tranche 18: geocode-unit.language-universal.test.js —
carmen:text_universal matches every requested language: universal
matches take no cross-language penalty, rank above autocompleted
default text, pass strict mode, and split comma-synonyms."""

import pytest

from acceptance_util import (_mk_spans, build_acceptance_index, tile_box,
                             tile_center, tiles_poly)

C32 = tile_center(6, 32, 32)
CEN0 = f"{C32[0]},{C32[1]}"
B32 = tiles_poly(tile_box(6, 32, 32))


@pytest.fixture(scope="module")
def universal_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    cfg = GeocoderConfig(layers={
        "country": LayerConfig("country", zoom=6,
                               geocoder_languages=["en", "sv"]),
        "region": LayerConfig("region", zoom=6,
                              geocoder_languages=["en"]),
    })
    return build_acceptance_index([
        ("region.1", _mk_spans([
            ("text", "Hron,Hronlandia", ""), ("lang:en", "Hron", ""),
            ("lang:universal", "HO", ""),
            ("geom", B32, ""), ("center", CEN0, ""), ("score", "1", "")])),
        ("region.2", _mk_spans([
            ("text", "Holdout", ""), ("lang:en", "Holdout", ""),
            ("lang:universal", "HT", ""),
            ("geom", B32, ""), ("center", CEN0, "")])),
        ("country.1", _mk_spans([
            ("text", "Wilderness", ""), ("lang:universal", "Cerracs", ""),
            ("geom", B32, ""), ("center", CEN0, "")])),
        ("country.2", _mk_spans([
            ("text", "United States", ""), ("lang:sv", "USA", ""),
            ("lang:universal", "US,USA", ""),
            ("geom", B32, ""), ("center", CEN0, ""),
            ("score", "1000", "")])),
        ("region.3", _mk_spans([
            ("text", "Usak", ""),
            ("geom", B32, ""), ("center", CEN0, "")])),
    ], cfg)


def test_universal_default_text(universal_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(universal_index, "Hron", limit=1)
    assert res and res[0]["feature_id"] == "region.1"


def test_universal_language_code(universal_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(universal_index, "Holdout", limit=1, language="en")
    assert res and res[0]["feature_id"] == "region.2"


def test_universal_text_matches(universal_index):
    """'HO' finds both the universal 'HO' feature and the 'Holdout'
    default-prefix feature (language-universal:114-120)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(universal_index, "HO", limit=5)
    assert len(res) == 2


def test_universal_ranks_complete_above_prefix(universal_index):
    """With a language code, the COMPLETE universal match outranks the
    autocompleted default text (language-universal:122-129)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(universal_index, "HO", limit=5, language="fr")
    assert len(res) == 2
    assert res[0]["feature_id"] == "region.1"


def test_universal_comma_synonyms_full_relevance(universal_index):
    """'usa' with language=en: the universal 'US,USA' comma-synonym
    matches at relevance 1 (language-universal:140-147)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(universal_index, "usa", limit=1, language="en")
    assert res and res[0]["feature_id"] == "country.2"
    assert res[0]["relevance"] == pytest.approx(1.0)
