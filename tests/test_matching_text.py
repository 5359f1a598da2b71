"""getMatchingText parity (format-features.js:383-488) and per-language
place formats (format-features.js:50-112)."""

from __future__ import annotations

import json as _json

import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def synonym_index(ray_session):
    import ray.data as rd

    from carmen_ray.index.build import build_index
    from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans

    def doc(doc_id, spans):
        return {"doc_id": doc_id, "spans": _mk_spans(spans)}

    rows = [
        doc("place.1", [
            ("text", "san francisco", ""),
            ("synonym", "frisco", ""),
            ("lang:es", "san pancho", ""),
            ("geom", _json.dumps({"type": "Point", "coordinates": [1.0, 1.0]}), ""),
            ("center", "1,1", ""),
            ("score", "100", ""),
        ]),
        doc("poi.1", [
            ("text", "coffee corner", ""),
            ("geom", _json.dumps({"type": "Point", "coordinates": [1.0, 1.0]}), ""),
            ("center", "1,1", ""),
            ("score", "10", ""),
        ]),
    ]
    tbl = pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.string()),
        "spans": pa.array([r["spans"] for r in rows], type=pa.list_(SPAN_TYPE)),
    })
    return build_index(rd.from_arrow(tbl).repartition(1))


def _index_data(idx, config=None):
    from carmen_ray.geocode.engine import IndexData

    return IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                     idx.layer_zooms, config=config)


def test_matching_text_synonym(synonym_index):
    """Query by a synonym → matching_text is the synonym, no language."""
    from carmen_ray.geocode.engine import forward_one

    index = _index_data(synonym_index)
    res = forward_one(index, "frisco")
    assert res and res[0]["feature_id"] == "place.1"
    assert res[0]["matching_text"] == "frisco"
    assert res[0].get("matching_language") is None
    assert res[0]["place_name"].startswith("san francisco")


def test_matching_text_display_query_is_none(synonym_index):
    """Query by the display name itself → no matching_text."""
    from carmen_ray.geocode.engine import forward_one

    index = _index_data(synonym_index)
    res = forward_one(index, "san francisco")
    assert res and res[0]["feature_id"] == "place.1"
    assert res[0]["matching_text"] is None


def test_matching_text_translation(synonym_index):
    """Query by a translation without requesting its language →
    matching_text + matching_language (underscore → dash)."""
    from carmen_ray.geocode.engine import forward_one

    index = _index_data(synonym_index)
    res = forward_one(index, "san pancho")
    assert res and res[0]["feature_id"] == "place.1"
    assert res[0]["matching_text"] == "san pancho"
    assert res[0]["matching_language"] == "es"


def test_matching_text_requested_language_suppressed(synonym_index):
    """Requesting the same language the match came from → text shown in
    that language already, so no matching_text."""
    from carmen_ray.geocode.engine import forward_one

    index = _index_data(synonym_index)
    res = forward_one(index, "san pancho", language="es")
    assert res and res[0]["feature_id"] == "place.1"
    # display IS san pancho (es requested) → matching_text suppressed
    assert res[0]["matching_text"] is None


def test_category_match_no_matching_text(ray_session):
    """geocoder_categories: a category term never becomes matching_text
    (format-features.js:462-464)."""
    import ray.data as rd

    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import forward_one
    from carmen_ray.index.build import build_index
    from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans

    spans = _mk_spans([
        ("text", "joes beans", ""),
        ("synonym", "coffee shop", ""),
        ("geom", _json.dumps({"type": "Point", "coordinates": [2.0, 2.0]}), ""),
        ("center", "2,2", ""),
        ("score", "10", ""),
    ])
    tbl = pa.table({
        "doc_id": pa.array(["poi.7"], type=pa.string()),
        "spans": pa.array([spans], type=pa.list_(SPAN_TYPE)),
    })
    idx = build_index(rd.from_arrow(tbl).repartition(1))
    cfg = GeocoderConfig(layers={"poi": LayerConfig(
        name="poi", geocoder_categories=["coffee shop"])})
    index = _index_data(idx, config=cfg)
    res = forward_one(index, "coffee shop")
    assert res and res[0]["feature_id"] == "poi.7"
    assert res[0]["matching_text"] is None  # category, not a synonym match
    # a non-category synonym on the same corpus still surfaces
    res2 = forward_one(_index_data(idx), "coffee shop")
    assert res2[0]["matching_text"] == "coffee shop"


def test_per_language_place_format():
    from carmen_ray.config import GeocoderConfig

    cfg = GeocoderConfig(place_formats={"ja": "{context} {name}"})
    assert cfg.render_place_name("東京", ["日本"], language="ja") == "日本 東京"
    assert cfg.render_place_name("Tokyo", ["Japan"], language="en") == "Tokyo, Japan"
    assert cfg.render_place_name("Tokyo", ["Japan"]) == "Tokyo, Japan"


def test_worldview_and_subtype_filters(ray_session):
    """Worldview-bound layers drop out of other worldviews
    (context.js:37-67) and type.subtype filters pass only features in
    the subtype's score range (filter-sources.js:43-110)."""
    import ray.data as rd

    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import IndexData, forward_one
    from carmen_ray.index.build import build_index
    from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans

    def doc(doc_id, text, lon, lat, score):
        return {"doc_id": doc_id, "spans": _mk_spans([
            ("text", text, ""),
            ("geom", _json.dumps({"type": "Point", "coordinates": [lon, lat]}), ""),
            ("center", f"{lon},{lat}", ""),
            ("score", str(score), ""),
        ])}

    rows = [
        doc("poi.1", "grand museum", 5.0, 5.0, 95),   # high score → landmark
        doc("poi.2", "corner museum", 6.0, 6.0, 5),   # low score
        doc("region.1", "disputed region", 7.0, 7.0, 50),
    ]
    tbl = pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.string()),
        "spans": pa.array([r["spans"] for r in rows], type=pa.list_(SPAN_TYPE)),
    })
    idx = build_index(rd.from_arrow(tbl).repartition(1))
    cfg = GeocoderConfig(layers={
        "poi": LayerConfig(name="poi", scoreranges={"landmark": (0.9, 1.0)}),
        "region": LayerConfig(name="region", geocoder_worldview="xx"),
    })
    index = IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                      idx.layer_zooms, config=cfg)

    # subtype filter: only the high-score poi passes poi.landmark
    res = forward_one(index, "grand museum", types=["poi.landmark"])
    assert res and res[0]["feature_id"] == "poi.1"
    res2 = forward_one(index, "corner museum", types=["poi.landmark"])
    assert not res2
    # plain type filter still passes both
    assert forward_one(index, "corner museum", types=["poi"])

    # worldview: region layer bound to "xx" is invisible from "yy"
    assert forward_one(index, "disputed region", worldview="xx")
    assert not forward_one(index, "disputed region", worldview="yy")
    assert forward_one(index, "disputed region")  # no worldview → all


def test_multi_synonym_feature(ray_session):
    """Features with 2+ synonyms (the reference's comma-synonym fixtures,
    geocode-unit.synonyms.test.js) must not crash get_matching_text —
    regression for numpy-array truthiness on the synonyms column."""
    import warnings

    import ray.data as rd

    from carmen_ray.geocode.engine import forward_one
    from carmen_ray.index.build import build_index
    from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans

    spans = _mk_spans([
        ("text", "new york", ""),
        ("synonym", "nyc", ""),
        ("synonym", "big apple", ""),
        ("synonym", "gotham", ""),
        ("geom", _json.dumps({"type": "Point", "coordinates": [3.0, 3.0]}), ""),
        ("center", "3,3", ""),
        ("score", "100", ""),
    ])
    tbl = pa.table({
        "doc_id": pa.array(["place.9"], type=pa.string()),
        "spans": pa.array([spans], type=pa.list_(SPAN_TYPE)),
    })
    idx = build_index(rd.from_arrow(tbl).repartition(1))
    index = _index_data(idx)
    with warnings.catch_warnings():
        warnings.simplefilter("error", DeprecationWarning)
        for q, want in [("nyc", "nyc"), ("big apple", "big apple"),
                        ("gotham", "gotham")]:
            res = forward_one(index, q)
            assert res and res[0]["feature_id"] == "place.9"
            assert res[0]["matching_text"] == want
        res = forward_one(index, "new york")
        assert res and res[0]["matching_text"] is None


def test_format_helpers_registry():
    """util/helpers.js port: moveNumberToEnd pins (test/unit/util/
    helpers.js) + user-supplied helpers (index.js:68-74 formatHelpers)
    merged over the defaults and invoked from templates."""
    from carmen_ray.config import GeocoderConfig
    from carmen_ray.util.helpers import move_number_to_end

    assert move_number_to_end("1 main st") == "main st 1"
    assert move_number_to_end("main st") == "main st"
    assert move_number_to_end("main st 1") == "main st 1"
    assert move_number_to_end(None) is None

    cfg = GeocoderConfig(place_format="{moveNumberToEnd name}, {context}")
    assert cfg.render_place_name("1 main st", ["springfield"]) == \
        "main st 1, springfield"

    # user helper overrides / extends the default registry
    cfg2 = GeocoderConfig(
        place_format="{shout name}, {context}",
        format_helpers={"shout": lambda s: str(s).upper()})
    assert cfg2.render_place_name("main st", ["springfield"]) == \
        "MAIN ST, springfield"

    # unresolved placeholders are stripped (format-features.js:108)
    cfg3 = GeocoderConfig(place_format="{nope} {name}")
    assert cfg3.render_place_name("main st", []) == "main st"
