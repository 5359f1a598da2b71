"""Round-5 tranche 4: language display acceptance ports.

- geocode-unit.localtext.test.js — synonym/translation display: the
  default text renders unless a language flag asks otherwise;
  out-of-language matches take the ×0.96-ish penalty; invalid authored
  carmen:text_{lc} codes fail the BUILD; matching_place_name carries
  the matched synonym.
- geocode-unit.multilanguage.test.js — `language` as a comma list:
  per-language text_{lc} / place_name_{lc} / language_{lc} fields with
  per-language formats, plus the three option validations (bogus code,
  >20 codes, duplicates).
"""

import pytest

from acceptance_util import (_mk_spans, build_acceptance_index, tile_box,
                             tile_center, tiles_poly)

C30 = tile_center(6, 30, 30)
CEN30 = f"{C30[0]},{C30[1]}"
B30 = tiles_poly(tile_box(6, 30, 30))
C32 = tile_center(6, 32, 32)
CEN32 = f"{C32[0]},{C32[1]}"
B32 = tiles_poly(tile_box(6, 32, 32))


# ------------------------------------------------------------------- localtext

@pytest.fixture(scope="module")
def russia_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    cfg = GeocoderConfig(layers={
        "country": LayerConfig("country", zoom=6,
                               geocoder_languages=["es", "ru", "zh_Latn"]),
        "region": LayerConfig("region", zoom=6,
                              geocoder_languages=["es", "ru", "zh_Latn"]),
    })
    return build_acceptance_index([
        ("country.2", _mk_spans([
            ("text", "Russian Federation", ""),
            ("synonym", "Rossiyskaya Federatsiya", ""),
            ("lang:ru", "Российская Федерация", ""),
            ("lang:zh_Latn", "Elousi", ""),
            ("geom", B30, ""), ("center", CEN30, "")])),
        ("region.2", _mk_spans([
            ("text", "Northwestern Federal District", ""),
            ("synonym", "Severo-Zapadny federalny okrug", ""),
            ("geom", B30, ""), ("center", CEN30, "")])),
    ], cfg)


def test_localtext_invalid_lang_code_fails_build(ray_session):
    """Authoring carmen:text_fake fails the index build
    (localtext.test.js:19-42)."""
    with pytest.raises(Exception, match="fake is an invalid language code"):
        build_acceptance_index([
            ("region.2", _mk_spans([
                ("text", "Northwestern Federal District", ""),
                ("lang:fake", "beetlejuice", ""),
                ("geom", B30, ""), ("center", CEN30, "")])),
        ])


def test_localtext_autocomplete_default(russia_index):
    """'russia' → 'Russian Federation' (localtext.test.js:88-96)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(russia_index, "russia", limit=1)
    assert res and res[0]["place_name"] == "Russian Federation"
    assert res[0]["feature_id"] == "country.2"


def test_localtext_synonym_matching_place_name(russia_index):
    """'Rossiyskaya' displays the default text with the synonym as
    matching_place_name (localtext.test.js:98-107)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(russia_index, "Rossiyskaya", limit=1)
    assert res and res[0]["place_name"] == "Russian Federation"
    assert res[0]["matching_place_name"] == "Rossiyskaya Federatsiya"


def test_localtext_out_of_language_penalty(russia_index):
    """'Российская' without a flag → default display, relevance ≤ .96
    (localtext.test.js:109-118)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(russia_index, "Российская", limit=1)
    assert res and res[0]["place_name"] == "Russian Federation"
    assert res[0]["relevance"] <= 0.96


def test_localtext_in_language_no_penalty(russia_index):
    """'Российская' with language='ru' → Russian display, language
    'ru', no penalty (localtext.test.js:120-131)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(russia_index, "Российская", limit=1, language="ru")
    assert res and res[0]["place_name"] == "Российская Федерация"
    assert res[0]["language"] == "ru"
    assert res[0]["relevance"] > 0.9


def test_localtext_multilanguage_first_wins(russia_index):
    """language='en,ru' → English display (penalized), with
    place_name_ru carrying the Russian rendering
    (localtext.test.js:133-143)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(russia_index, "Российская", limit=1, language="en,ru")
    assert res and res[0]["place_name"] == "Russian Federation"
    assert res[0]["relevance"] <= 0.96
    assert res[0]["place_name_ru"] == "Российская Федерация"


def test_localtext_full_translation_query(russia_index):
    """'Российская Федерация' → 'Russian Federation'
    (localtext.test.js:145-153)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(russia_index, "Российская Федерация", limit=1)
    assert res and res[0]["place_name"] == "Russian Federation"


def test_localtext_latin_script_translation(russia_index):
    """'Elousi' (zh_Latn) indexes as a synonym
    (localtext.test.js:155-164)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(russia_index, "Elousi", limit=1)
    assert res and res[0]["place_name"] == "Russian Federation"


def test_localtext_low_relev_fails(russia_index):
    """'fake blah blah' scores under the 0.5 bar → no result
    (localtext.test.js:175-183)."""
    from carmen_ray.geocode.engine import forward_one

    assert forward_one(russia_index, "fake blah blah", limit=1) == []


# --------------------------------------------------------------- multilanguage

@pytest.fixture(scope="module")
def paris_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    cfg = GeocoderConfig(
        # the fixture's geocoder_format_es / _ja templates
        # ('{{place.name}} {{country.name}}' / the ja reversal)
        # expressed in this engine's template vocabulary
        place_formats={"en": "{name} {context}",
                       "es": "{name} {context}",
                       "ja": "{context} {name}"},
        layers={
            "country": LayerConfig("country", zoom=6),
            "place": LayerConfig("place", zoom=6),
        })
    return build_acceptance_index([
        ("country.1", _mk_spans([
            ("text", "France", ""), ("lang:en", "France", ""),
            ("lang:es", "Francia", ""), ("lang:ja", "フランス", ""),
            ("geom", B32, ""), ("center", CEN32, "")])),
        ("place.1", _mk_spans([
            ("text", "Paris", ""), ("lang:en", "Paris", ""),
            ("lang:es", "París", ""), ("lang:ja", "パリ", ""),
            ("geom", B32, ""), ("center", CEN32, "")])),
    ], cfg)


def test_multilanguage_bogus_code_errors(paris_index):
    from carmen_ray.geocode.engine import forward_one

    with pytest.raises(ValueError, match="'bogus' is not a valid language"):
        forward_one(paris_index, "paris", limit=1, language="en,es,bogus")


def test_multilanguage_too_many_errors(paris_index):
    from carmen_ray.geocode.engine import forward_one

    langs = "ab,af,ak,sq,am,ar,an,hy,as,av,ae,ay,az,ba,bm,eu,be,bn,bh,bi,bo,bs"
    with pytest.raises(ValueError, match="no more than 20 languages"):
        forward_one(paris_index, "paris", limit=1, language=langs)


def test_multilanguage_duplicate_errors(paris_index):
    from carmen_ray.geocode.engine import forward_one

    with pytest.raises(ValueError, match="unique language codes"):
        forward_one(paris_index, "paris", limit=1, language="en,en")


def test_promote_language_exact_penalty(ray_session):
    """geocode-unit.promote-language.test.js:104-109: 'nueva york usa'
    with language=es — the untranslated 'usa' cover takes the ×0.96
    grid penalty, which decomposes through rebalance to exactly
    0.982963; and a 'ca' request falls back to es at full relevance
    (:111-117)."""
    import json

    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import forward_one

    usa = json.dumps({"type": "Polygon", "coordinates": [[
        [-40, -40], [-40, 40], [40, 40], [40, -40], [-40, -40]]]})
    ny = json.dumps({"type": "Polygon", "coordinates": [[
        [-20, -20], [-20, 20], [20, 20], [20, -20], [-20, -20]]]})
    cfg = GeocoderConfig(layers={
        "country": LayerConfig("country", zoom=6,
                               geocoder_languages=["es"]),
        "place": LayerConfig("place", zoom=6, geocoder_languages=["es"]),
    })
    ix = build_acceptance_index([
        ("country.1", _mk_spans([
            ("text", "united states", ""), ("synonym", "usa", ""),
            ("geom", usa, ""), ("center", "0,0", ""),
            ("score", "2", "")])),
        ("place.1", _mk_spans([
            ("text", "new york", ""), ("lang:es", "nueva york", ""),
            ("geom", ny, ""), ("center", "0,0", ""), ("score", "1", "")])),
    ], cfg)
    res = forward_one(ix, "nueva york usa", limit=1, language="es")
    assert res and res[0]["feature_id"] == "place.1"
    assert res[0]["relevance"] == pytest.approx(0.982963, abs=1e-6)

    res = forward_one(ix, "nueva york", limit=1, language="ca")
    assert res and res[0]["feature_id"] == "place.1"
    assert res[0]["relevance"] == pytest.approx(1.0)


def test_multilanguage_full_output(paris_index):
    """language='en,es,ja' → per-language text/place_name/language
    fields; unsuffixed = first (multilanguage.test.js:87-124)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(paris_index, "paris", limit=1, language="en,es,ja")
    assert res
    r = res[0]
    assert r["feature_id"] == "place.1"
    assert r["text"] == "Paris"
    assert r["place_name"] == "Paris France"
    assert r["language"] == "en"
    assert r["text_en"] == "Paris"
    assert r["place_name_en"] == "Paris France"
    assert r["language_en"] == "en"
    assert r["text_es"] == "París"
    assert r["place_name_es"] == "París Francia"
    assert r["language_es"] == "es"
    assert r["text_ja"] == "パリ"
    assert r["place_name_ja"] == "フランス パリ"
    assert r["language_ja"] == "ja"
