"""languageMode=strict — port of
/root/reference/test/acceptance/geocode-unit.languageMode.test.js
(all four fixture groups: the basic strict filter forward+reverse, the
context place_name filtering, and both digraphic-exclusion groups with
and without an sr_Latn country translation).

Divergence note: carmen's reverse geocode returns the context chain as
separate features; this engine returns one top feature with a context
id list. The reverse assertions here pin the same filtering semantics
through that shape (filtered place_name + filtered context ids).
"""

import json

import pyarrow as pa
import pytest

from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans


def _doc(doc_id, entries):
    return doc_id, _mk_spans(entries)


def _pt(lon, lat):
    return json.dumps({"type": "Point", "coordinates": [lon, lat]})


def _build(rows, ray_session=None):
    import ray.data as rd

    from carmen_ray.index.build import build_index

    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE)),
    })
    return build_index(rd.from_arrow(tbl).repartition(1))


def _index(idx):
    from carmen_ray.geocode.engine import IndexData

    return IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                     idx.layer_zooms)


# ---------------------------------------------------------------- group 1
@pytest.fixture(scope="module")
def countries(ray_session):
    """China (zh+en), Canada (en), Cambodia (default only) — the first
    fixture block of the reference file."""
    rows = [
        _doc("country.1", [("text", "China", ""), ("lang:zh", "中国", ""),
                           ("lang:en", "China", ""),
                           ("geom", _pt(1, 1), ""), ("center", "1,1", "")]),
        _doc("country.2", [("text", "Canada", ""), ("lang:en", "Canada", ""),
                           ("geom", _pt(1, 1), ""), ("center", "1,1", "")]),
        _doc("country.3", [("text", "Cambodia", ""),
                           ("geom", _pt(1, 1), ""), ("center", "1,1", "")]),
    ]
    return _build(rows)


def test_strict_zh_filters_forward(countries):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(_index(countries), "c", language="zh",
                      language_mode="strict")
    assert len(res) == 1
    assert res[0]["place_name"] == "中国"


def test_strict_en_filters_forward(countries):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(_index(countries), "c", language="en",
                      language_mode="strict")
    assert {r["place_name"] for r in res} == {"Canada", "China"}


def test_strict_without_language_is_noop(countries):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(_index(countries), "c", language_mode="strict")
    assert {r["place_name"] for r in res} == {"Cambodia", "Canada", "China"}


def test_bogus_language_mode_rejected(countries):
    from carmen_ray.geocode.engine import forward_one, reverse_one

    with pytest.raises(ValueError, match="not a valid language mode"):
        forward_one(_index(countries), "c", language="en",
                    language_mode="bogus")
    with pytest.raises(ValueError, match="not a valid language mode"):
        reverse_one(_index(countries), 1.0, 1.0, language="en",
                    language_mode="bogus")


def test_strict_zh_filters_reverse_multi(countries):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(_index(countries), 1.0, 1.0, limit=5,
                      types=["country"], language="zh",
                      language_mode="strict")
    assert len(res) == 1
    assert res[0]["place_name"] == "中国"


def test_strict_en_filters_reverse_multi(countries):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(_index(countries), 1.0, 1.0, limit=5,
                      types=["country"], language="en",
                      language_mode="strict")
    assert {r["place_name"] for r in res} == {"China", "Canada"}


def test_strict_reverse_without_language_is_noop(countries):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(_index(countries), 1.0, 1.0, limit=5,
                      types=["country"], language_mode="strict")
    assert {r["place_name"] for r in res} == {"China", "Canada", "Cambodia"}


# ---------------------------------------------------------------- group 2
@pytest.fixture(scope="module")
def chicago(ray_session):
    """US (zh+en) > Illinois (en) > Chicago (zh+en) — strict mode must
    drop Illinois from the rendered context in zh."""
    rows = [
        _doc("country.1", [("text", "United States", ""),
                           ("lang:zh", "美国", ""),
                           ("lang:en", "United States", ""),
                           ("geom", _pt(1, 1), ""), ("center", "1,1", "")]),
        _doc("region.1", [("text", "Illinois", ""),
                          ("lang:en", "Illinois", ""),
                          ("geom", _pt(1, 1), ""), ("center", "1,1", "")]),
        _doc("place.1", [("text", "Chicago", ""), ("lang:zh", "芝加哥", ""),
                         ("lang:en", "Chicago", ""),
                         ("geom", _pt(1, 1), ""), ("center", "1,1", "")]),
    ]
    return _build(rows)


def test_strict_zh_filters_context(chicago):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(_index(chicago), "c", language="zh",
                      language_mode="strict")
    assert len(res) == 1
    assert res[0]["place_name"] == "芝加哥, 美国"  # Illinois dropped
    assert res[0]["context"] == ["country.1"]


def test_strict_zh_filters_reverse_context(chicago):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(_index(chicago), 1.0, 1.0, language="zh",
                      language_mode="strict")
    assert res
    assert res[0]["place_name"] == "芝加哥, 美国"
    assert res[0]["context"] == ["country.1"]


def test_strict_en_keeps_full_reverse_context(chicago):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(_index(chicago), 1.0, 1.0, language="en",
                      language_mode="strict")
    assert res
    assert res[0]["place_name"] == "Chicago, Illinois, United States"

    # no language code → strict is a no-op
    res2 = reverse_one(_index(chicago), 1.0, 1.0, language_mode="strict")
    assert res2[0]["place_name"] == "Chicago, Illinois, United States"


# ------------------------------------------------------------ groups 3+4
def _belgrade_rows(with_sr_latn_country):
    country = [("text", "United States", ""),
               ("lang:en", "United States", ""),
               ("lang:sr", "Сједињене Америчке Државе", "")]
    if with_sr_latn_country:
        country.append(("lang:sr_Latn", "Sjedinjene Američke Države", ""))
    country += [("geom", _pt(1, 1), ""), ("center", "1,1", "")]
    return [
        _doc("country.1", country),
        _doc("region.1", [("text", "Texas", ""), ("lang:hr", "Teksas", ""),
                          ("geom", _pt(1, 1), ""), ("center", "1,1", "")]),
        _doc("place.1", [("text", "Paris", ""), ("lang:sr", "Парис", ""),
                         ("geom", _pt(1, 1), ""), ("center", "1,1", "")]),
        _doc("place.2", [("text", "Belgrade", ""),
                         ("lang:sr", "Београд", ""),
                         ("lang:hr", "Beograd", ""),
                         ("geom", _pt(1, 1), ""),
                         ("center", "1,1", "")]),
    ]


@pytest.fixture(scope="module")
def belgrade_with_fallback(ray_session):
    return _build(_belgrade_rows(True))


@pytest.fixture(scope="module")
def belgrade_without_fallback(ray_session):
    return _build(_belgrade_rows(False))


def test_digraphic_mixed_script_filtered(belgrade_with_fallback,
                                         belgrade_without_fallback):
    """sr-Latn strict rejects a Cyrillic-only (sr) feature — the
    digraphic exclusion (closest-lang.js:242)."""
    from carmen_ray.geocode.engine import forward_one

    for built in (belgrade_with_fallback, belgrade_without_fallback):
        res = forward_one(_index(built), "paris", language="sr-Latn",
                          language_mode="strict")
        assert res == []


def test_digraphic_equivalent_language_allowed(belgrade_with_fallback,
                                               belgrade_without_fallback):
    """sr-Latn strict allows an hr translation (equivalent-languages)."""
    from carmen_ray.geocode.engine import forward_one

    for built in (belgrade_with_fallback, belgrade_without_fallback):
        res = forward_one(_index(built), "belgrade", language="sr-Latn",
                          language_mode="strict")
        assert len(res) == 1
        assert res[0]["language"] == "hr"


def test_hr_strict_with_sr_latn_country_fallback(belgrade_with_fallback):
    """language=hr keeps the country via its sr_Latn text (equivalent)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(_index(belgrade_with_fallback), "belgrade",
                      language="hr", language_mode="strict")
    assert len(res) == 1
    assert res[0]["language"] == "hr"
    assert res[0]["place_name"] == \
        "Beograd, Teksas, Sjedinjene Američke Države"


# ------------------------------------------------- languageMode-universal
# port of geocode-unit.languageMode-universal.test.js: a
# geocoder_universal_text source's features pass the strict filter and
# take no language penalty
@pytest.fixture(scope="module")
def universal_built(ray_session):
    rows = [
        _doc("country.1", [("text", "United States", ""),
                           ("lang:es", "Estados Unidos", ""),
                           ("geom", _pt(1, 1), ""), ("center", "1,1", "")]),
        _doc("postcode.1", [("text", "10000", ""),
                            ("geom", _pt(1, 1), ""), ("center", "1,1", "")]),
    ]
    return _build(rows)


def _universal_index(built):
    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import IndexData

    cfg = GeocoderConfig(layers={"postcode": LayerConfig(
        name="postcode", geocoder_universal_text=True)})
    return IndexData(built.features, built.phrase_grid, built.freq,
                     built.max_score, built.layer_zooms, config=cfg)


def test_universal_text_no_language(universal_built):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(_universal_index(universal_built), "10000")
    assert res and res[0]["place_name"] == "10000, United States"
    assert res[0]["relevance"] == 1


def test_universal_text_language_es(universal_built):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(_universal_index(universal_built), "10000",
                      language="es")
    assert res and res[0]["place_name"] == "10000, Estados Unidos"
    assert res[0]["relevance"] == 1  # no language penalty for universal


def test_universal_text_passes_strict(universal_built):
    from carmen_ray.geocode.engine import forward_one, reverse_one

    idx = _universal_index(universal_built)
    res = forward_one(idx, "10000", language="es", language_mode="strict")
    assert res and res[0]["place_name"] == "10000, Estados Unidos"

    rev = reverse_one(idx, 1.0, 1.0, language="es", language_mode="strict")
    assert rev and rev[0]["place_name"] == "10000, Estados Unidos"


def test_universal_lang_span_passes_strict(ray_session):
    """A lang:universal span passes strict for any requested language
    (closest-lang 'universal' label)."""
    built = _build([
        _doc("poi.1", [("text", "airport", ""),
                       ("lang:universal", "airport", ""),
                       ("geom", _pt(2, 2), ""), ("center", "2,2", "")]),
    ])
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(_index(built), "airport", language="zh",
                      language_mode="strict")
    assert len(res) == 1


def test_hr_strict_without_sr_latn_country_excludes(belgrade_without_fallback):
    """Without the sr_Latn translation the country's closest label is
    en → filtered from the rendered context."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(_index(belgrade_without_fallback), "belgrade",
                      language="hr", language_mode="strict")
    assert len(res) == 1
    assert res[0]["place_name"] == "Beograd, Teksas"
