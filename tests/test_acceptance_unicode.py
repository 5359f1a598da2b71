"""Unicode & degenerate-prefix behaviors — ports of
/root/reference/test/acceptance/geocode-unit.unicode.test.js,
geocode-unit.early-degen.test.js, geocode-unit.dict-collision.test.js
and geocode-unit.fnv1a-collision.test.js.

CJK/Cyrillic text matches natively and by autocomplete prefix;
transliteration is DISABLED (latin 'jing'/'moskva'/'m' never match);
diacritics fold ('jose' → 'josé', 'Москва́' → 'москва'); an abbreviated
'Brehmestr.' still completes into 'Brehmestraße' with the address
number formatted by the source's geocoder_format; and hash collisions
(dict + fnv1a) never surface the colliding twin."""

import json

import pyarrow as pa
import pytest

from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans

PT0 = json.dumps({"type": "Point", "coordinates": [0, 0]})
MPT0 = json.dumps({"type": "MultiPoint", "coordinates": [[0, 0]]})


def _build(rows, cfg=None):
    import ray.data as rd

    from carmen_ray.geocode.engine import IndexData
    from carmen_ray.index.build import build_index

    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows]),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE))})
    idx = build_index(rd.from_arrow(tbl).repartition(1), config=cfg)
    return IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                     idx.layer_zooms, config=cfg)


@pytest.fixture(scope="module")
def uni_index(ray_session):
    return _build([
        ("place.1", _mk_spans([("text", "京都市", ""),
                               ("geom", PT0, ""), ("center", "0,0", "")])),
        ("place.2", _mk_spans([("text", "josé", ""),
                               ("geom", PT0, ""), ("center", "0,0", "")])),
        ("place.3", _mk_spans([("text", "москва", ""),
                               ("geom", PT0, ""), ("center", "0,0", "")])),
    ])


@pytest.mark.parametrize("query,want", [
    ("京", "京都市"),          # CJK autocomplete prefix
    ("京都市", "京都市"),
    ("jing", None),            # CJK transliteration disabled
    ("jing du shi", None),
    ("ji", None),              # partial unidecoded term
    ("м", "москва"),
    ("москва", "москва"),
    ("Москва́", "москва"),      # combining-accent strip
    ("m", None),               # latin prefix never matches Cyrillic
    ("moskva", None),
    ("j", "josé"),
    ("jose", "josé"),          # diacritic fold
    ("josé", "josé"),
])
def test_unicode_matching(uni_index, query, want):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(uni_index, query, limit=1)
    if want is None:
        assert res == []
    else:
        assert res and res[0]["place_name"] == want


def test_early_degen_abbreviated_street(ray_session):
    """early-degen.test.js: '56 Brehmestr.' completes into
    'Brehmestraße 56' under geocoder_format '{name} {address}'."""
    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import forward_one

    cfg = GeocoderConfig(
        layers={"address": LayerConfig("address", zoom=6,
                                       geocoder_address=True)},
        place_format="{name} {address}")
    ix = _build([("address.1", _mk_spans([
        ("text", "Brehmestraße", ""), ("geom", MPT0, ""),
        ("center", "0,0", ""), ("addr_numbers", "56", "")]))], cfg)
    res = forward_one(ix, "56 Brehmestr.", limit=1)
    assert res[0]["place_name"] == "Brehmestraße 56"


def test_dict_collision_unicode_phrase(ray_session):
    """dict-collision.test.js: the CJK phrase round-trips the phrase
    dictionary without colliding."""
    from carmen_ray.geocode.engine import forward_one

    ix = _build([("place.1", _mk_spans([
        ("text", "京都市", ""), ("geom", PT0, ""), ("center", "0,0", "")]))])
    res = forward_one(ix, "京都市", limit=1)
    assert len(res) == 1 and res[0]["feature_id"] == "place.1"


def test_fnv1a_collision_partial_terms(ray_session):
    """fnv1a-collision.test.js: the colliding street never matches a
    query for its twin."""
    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import forward_one

    rows = [
        ("street.1", _mk_spans([("text", "av francisco de aguirre", ""),
                                ("geom", MPT0, ""), ("center", "0,0", ""),
                                ("addr_numbers", "2", "")])),
        ("street.2", _mk_spans([("text", "r ademar da silva neiva", ""),
                                ("geom", MPT0, ""), ("center", "0,0", ""),
                                ("addr_numbers", "2", "")])),
    ]
    cfg = GeocoderConfig(layers={
        "street": LayerConfig("street", zoom=6, geocoder_address=True)})
    ix = _build(rows, cfg)
    res = forward_one(ix, "av francisco de aguirre 2 la serena", limit=2)
    assert len(res) == 1
    assert res[0]["feature_id"] == "street.1"
