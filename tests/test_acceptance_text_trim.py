"""Display-text trimming — port of
/root/reference/test/acceptance/geocode-unit.text-trim.test.js.

carmen:text values authored with stray whitespace ('  Colombia\\n',
' Bogotá ') render trimmed in place_name, in the default language and
under ?language=en / ?language=zh, forward AND reverse — the
split(',')[0].trim() display rule of closest-lang.js:324-328."""

import json

import pyarrow as pa
import pytest

from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans

CPOLY = json.dumps({"type": "Polygon", "coordinates": [[
    [-5, -5], [5, -5], [5, 5], [-5, 5], [-5, -5]]]})
PT = json.dumps({"type": "Point", "coordinates": [0.5, 0.5]})


@pytest.fixture(scope="module")
def trim_index(ray_session):
    import ray.data as rd

    from carmen_ray.geocode.engine import IndexData
    from carmen_ray.index.build import build_index

    rows = [
        ("country.1", _mk_spans([
            ("text", "  Colombia\n", ""),
            ("lang:en", " Colombia\n", ""),
            ("lang:zh", " 哥伦比亚\n", ""),
            ("geom", CPOLY, ""), ("center", "0.5,0.5", "")])),
        ("region.1", _mk_spans([
            ("text", " Bogotá ", ""),
            ("lang:en", " Bogota ", ""),
            ("lang:zh", " 波哥大 ", ""),
            ("geom", PT, ""), ("center", "0.5,0.5", "")])),
    ]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows]),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE))})
    idx = build_index(rd.from_arrow(tbl).repartition(1))
    return IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                     idx.layer_zooms)


@pytest.mark.parametrize("lang,expected", [
    (None, "Bogotá, Colombia"),
    ("en", "Bogota, Colombia"),
    ("zh", "波哥大, 哥伦比亚"),
])
def test_trims_forward(trim_index, lang, expected):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(trim_index, "Bogota", limit=1, language=lang)
    assert res[0]["place_name"] == expected


@pytest.mark.parametrize("lang,expected", [
    (None, "Bogotá, Colombia"),
    ("en", "Bogota, Colombia"),
    ("zh", "波哥大, 哥伦比亚"),
])
def test_trims_reverse(trim_index, lang, expected):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(trim_index, 0.5, 0.5, limit=1, language=lang)
    assert res[0]["place_name"] == expected


def test_comma_synonym_display_takes_first(trim_index, ray_session):
    """carmen:text comma form: display is the FIRST synonym, trimmed
    (closest-lang.js:324)."""
    import ray.data as rd

    from carmen_ray.geocode.engine import IndexData, forward_one
    from carmen_ray.index.build import build_index

    rows = [("place.1", _mk_spans([
        ("text", "United States, USA , US", ""),
        ("geom", PT, ""), ("center", "0.5,0.5", "")]))]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows]),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE))})
    idx = build_index(rd.from_arrow(tbl).repartition(1))
    ix = IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                   idx.layer_zooms)
    res = forward_one(ix, "united states", limit=1)
    assert res and res[0]["place_name"] == "United States"
