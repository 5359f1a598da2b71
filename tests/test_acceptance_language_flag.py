"""Language flag + fallback — port of
/root/reference/test/acceptance/geocode-unit.language-flag.test.js and
geocode-unit.languageFallback.test.js (synonym display, closest-lang
fallback chains, language-code validation, context translation, and the
per-language format template via the config's place_formats analog).

Deviations from the source fixture: centers/probes sit strictly inside
the polygon (the reference centers on a polygon vertex, undefined for
even-odd PIP), and the handlebars-per-source templates are exercised
through the config-level place_formats dict (same rendered output for
the ru-template case; the eo cross-layer template is out of scope of
the simplified {name}/{context} placeholder model).
"""

import json

import pyarrow as pa
import pytest

from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans


POLY = json.dumps({"type": "Polygon", "coordinates": [[
    [0, -5.616], [0, 0], [5.625, 0], [5.625, -5.616], [0, -5.616]]]})


def _doc(doc_id, entries):
    return doc_id, _mk_spans(entries)


@pytest.fixture(scope="module")
def russia(ray_session):
    import ray.data as rd

    from carmen_ray.index.build import build_index

    rows = [
        _doc("country.1", [
            ("text", "Russian Federation", ""),
            ("synonym", "Rossiyskaya Federatsiya", ""),
            ("lang:ru", "Российская Федерация", ""),
            ("lang:tr", "Rusya", ""),
            ("geom", POLY, ""), ("center", "2,-2", "")]),
        _doc("region.1", [
            ("text", "Northwestern Federal District", ""),
            ("synonym", "Severo-Zapadny federalny okrug", ""),
            ("lang:zh", "西北部联邦管区", ""),
            ("lang:zh_Hant", "西北部聯邦管區", ""),
            ("lang:ru", "Северо-Западный федеральный округ", ""),
            ("lang:eo", "!!!!", ""),
            ("geom", POLY, ""), ("center", "2,-2", "")]),
        _doc("place.1", [
            ("text", "Saint Petersburg", ""),
            ("synonym", "St Petersburg", ""),
            ("lang:ru", "Санкт-Петербу́рг", ""),
            ("geom", POLY, ""), ("center", "2,-2", "")]),
    ]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE)),
    })
    return build_index(rd.from_arrow(tbl).repartition(1))


def _index(idx, config=None):
    from carmen_ray.geocode.engine import IndexData

    return IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                     idx.layer_zooms, config=config)


def test_default_text_no_language_key(russia):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(_index(russia), "russia", limit=1)
    assert res[0]["place_name"] == "Russian Federation"
    assert res[0]["feature_id"] == "country.1"
    assert res[0]["language"] is None


def test_synonym_matching_text(russia):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(_index(russia), "Rossiyskaya", limit=1)
    assert res[0]["place_name"] == "Russian Federation"
    assert res[0]["matching_text"] == "Rossiyskaya Federatsiya"
    assert res[0]["language"] is None


def test_language_ru_and_subtag_guess(russia):
    from carmen_ray.geocode.engine import forward_one

    for lang in ("ru", "ru-RU"):
        res = forward_one(_index(russia), "Rossiyskaya Federatsiya",
                          limit=1, language=lang)
        assert res[0]["place_name"] == "Российская Федерация"
        assert res[0]["language"] == "ru"


def test_invalid_language_codes_rejected(russia):
    from carmen_ray.geocode.engine import forward_one, reverse_one

    with pytest.raises(ValueError, match="not a valid language code"):
        forward_one(_index(russia), "Rossiyskaya", language="fake")
    with pytest.raises(ValueError, match="not a valid language code"):
        forward_one(_index(russia), "Rossiyskaya",
                    language="nonexistent-nonexistent")
    with pytest.raises(ValueError, match="not a valid language code"):
        reverse_one(_index(russia), 2.0, -2.0, language="fake")


def test_missing_language_falls_back_to_default(russia):
    from carmen_ray.geocode.engine import forward_one

    for lang in ("es", "fr"):
        res = forward_one(_index(russia), "Rossiyskaya Federatsiya",
                          limit=1, language=lang)
        assert res[0]["place_name"] == "Russian Federation"
        assert res[0]["language"] is None


def test_fallback_chains(russia):
    from carmen_ray.geocode.engine import forward_one

    # az falls back to tr (fallback-display)
    res = forward_one(_index(russia), "Russian Federation", limit=1,
                      language="az")
    assert res[0]["place_name"] == "Rusya"
    assert res[0]["language"] == "tr"

    # bg-nonexistent: garbage subtag is tolerated, bg falls back to ru
    res = forward_one(_index(russia), "Russian Federation", limit=1,
                      language="bg-nonexistent")
    assert res[0]["place_name"] == "Российская Федерация"
    assert res[0]["language"] == "ru"


def test_context_translated(russia):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(_index(russia), "St Petersburg", limit=1,
                      language="ru")
    assert res[0]["feature_id"] == "place.1"
    assert res[0]["place_name"] == (
        "Санкт-Петербу́рг, Северо-Западный федеральный округ, "
        "Российская Федерация")

    # multi-index query text
    res = forward_one(_index(russia), "St Petersburg, Russia",
                      language="ru")
    assert res[0]["feature_id"] == "place.1"
    assert res[0]["place_name"].startswith("Санкт-Петербу́рг")


def test_context_untranslated_without_values(russia):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(_index(russia), "St Petersburg", limit=1,
                      language="fr")
    assert res[0]["place_name"] == (
        "Saint Petersburg, Northwestern Federal District, "
        "Russian Federation")


def test_reverse_language(russia):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(_index(russia), 2.0, -2.0, language="en")
    assert res[0]["feature_id"] == "place.1"
    assert res[0]["place_name"] == (
        "Saint Petersburg, Northwestern Federal District, "
        "Russian Federation")

    # zh translates only the region (specific→general rendering)
    res = reverse_one(_index(russia), 2.0, -2.0, language="zh")
    assert res[0]["place_name"] == (
        "Saint Petersburg, 西北部联邦管区, Russian Federation")


def test_zh_hant_case_and_separator_robust(russia):
    from carmen_ray.geocode.engine import forward_one

    for lang in ("zh_Hant", "zh-Hant", "zh_hant", "zh-hant",
                 "zh_TW", "zh-TW", "zh_tw", "zh-tw"):
        res = forward_one(_index(russia), "Saint Petersburg", limit=1,
                          language=lang)
        assert "西北部聯邦管區" in res[0]["place_name"], lang


def test_per_language_format_template(russia):
    """The ru place_formats template applies only when the language
    actually matched (the 'Northwestern' ru vs es template cases)."""
    from carmen_ray.config import GeocoderConfig
    from carmen_ray.geocode.engine import forward_one

    cfg = GeocoderConfig(place_formats={"ru": "{context}, {name}"})
    idx = _index(russia, config=cfg)
    res = forward_one(idx, "Northwestern", limit=1, language="ru",
                      types=["region"])
    assert res[0]["place_name"] == (
        "Российская Федерация, Северо-Западный федеральный округ")
    # ru-RU guesses both the language and the template
    res = forward_one(idx, "Northwestern", limit=1, language="ru-RU",
                      types=["region"])
    assert res[0]["place_name"].startswith("Российская Федерация,")
    # es matches no text → default template, default text
    res = forward_one(idx, "Northwestern", limit=1, language="es",
                      types=["region"])
    assert res[0]["place_name"] == (
        "Northwestern Federal District, Russian Federation")


def test_garbage_query_no_results(russia):
    from carmen_ray.geocode.engine import forward_one

    assert forward_one(_index(russia), "fake blah blah", limit=1) == []


# ------------------------------------------------------- languageFallback
# port of geocode-unit.languageFallback.test.js: table fallback (ar→en)
# and the scored script heuristic (ar→ur via shared Arab script)
@pytest.fixture(scope="module")
def fallback_built(ray_session):
    import ray.data as rd

    from carmen_ray.index.build import build_index

    rows = [
        _doc("country.1", [("text", "United States", ""),
                           ("lang:en", "United States", ""),
                           ("geom", json.dumps({"type": "Point",
                                                "coordinates": [1, 1]}), ""),
                           ("center", "1,1", "")]),
        _doc("country.2", [("text", "india", ""),
                           ("lang:ur", "بھارت", ""),
                           ("lang:fa", "هندوستان", ""),
                           ("geom", json.dumps({"type": "Point",
                                                "coordinates": [1, 1]}), ""),
                           ("center", "1,1", "")]),
    ]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE)),
    })
    return build_index(rd.from_arrow(tbl).repartition(1))


def test_table_fallback_ar_to_en(fallback_built):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(_index(fallback_built), "United States",
                      language="ar")
    assert res[0]["place_name"] == "United States"
    assert res[0]["language"] == "en"


def test_script_heuristic_ar_to_ur(fallback_built):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(_index(fallback_built), "India", language="ar")
    assert res[0]["place_name"] == "بھارت"
    assert res[0]["language"] == "ur"
