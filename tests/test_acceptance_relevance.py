"""Relevance pins — ports of
/root/reference/test/acceptance/geocode-unit.relevance.test.js and
geocode-unit.context-overlap.test.js.

relevance.test.js: per-layer geocoder_tokens (Drive→Dr on the address
source) make '11027 S. Pikes Peak Drive' a perfect match (1.00); the
unmatched apartment token '#201' lowers it to exactly 0.648148.

context-overlap.test.js: two sources sharing geocoder_name='place'
contribute ONE context entry (the stackFeatures per-type memo); the
finer-idx twin wins."""

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
def rv_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    rows = [
        ("country.1", _mk_spans([("text", "United States", ""),
                                 ("geom", PT0, ""), ("center", "0,0", "")])),
        ("region.1", _mk_spans([("text", "Colorado", ""),
                                ("geom", PT0, ""), ("center", "0,0", "")])),
        ("postcode.1", _mk_spans([("text", "80138", ""),
                                  ("geom", PT0, ""), ("center", "0,0", "")])),
        ("place.1", _mk_spans([("text", "Parker", ""),
                               ("geom", PT0, ""), ("center", "0,0", "")])),
        ("address.1", _mk_spans([("text", "S Pikes Peak Dr", ""),
                                 ("geom", MPT0, ""), ("center", "0,0", ""),
                                 ("addr_numbers", "11027", "")])),
    ]
    cfg = GeocoderConfig(layers={
        "address": LayerConfig("address", zoom=6, geocoder_address=True,
                               geocoder_tokens={"Drive": "Dr"})})
    return _build(rows, cfg)


def test_apartment_number_lowers_relevance(rv_index):
    """relevance.test.js:98-104 pins 0.648148 exactly."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(rv_index, "11027 S. Pikes Peak Drive #201", limit=1)
    assert res[0]["feature_id"] == "address.1"
    assert res[0]["relevance"] == 0.648148


def test_full_match_without_apartment(rv_index):
    """relevance.test.js:106-112: per-layer Drive→Dr yields 1.00."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(rv_index, "11027 S. Pikes Peak Drive", limit=1)
    assert res[0]["feature_id"] == "address.1"
    assert res[0]["relevance"] == 1.0


def test_geocoder_name_context_dedupe(ray_session):
    """context-overlap.test.js: one context entry per geocoder_name."""
    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import forward_one

    rows = [
        ("place_a.1", _mk_spans([("text", "sadtown", ""),
                                 ("geom", PT0, ""), ("center", "0,0", "")])),
        ("place_b.2", _mk_spans([("text", "funtown", ""),
                                 ("geom", PT0, ""), ("center", "0,0", "")])),
        ("street_a.2", _mk_spans([("text", "wall street", ""),
                                  ("geom", PT0, ""), ("center", "0,0", "")])),
        ("street_b.1", _mk_spans([("text", "main street", ""),
                                  ("geom", PT0, ""), ("center", "0,0", "")])),
    ]
    cfg = GeocoderConfig(layers={
        "place_a": LayerConfig("place_a", zoom=6, geocoder_name="place"),
        "place_b": LayerConfig("place_b", zoom=6, geocoder_name="place"),
        "street_a": LayerConfig("street_a", zoom=6, geocoder_name="street"),
        "street_b": LayerConfig("street_b", zoom=6, geocoder_name="street"),
    })
    ix = _build(rows, cfg)
    res = forward_one(ix, "main street", limit=1)
    assert res[0]["feature_id"] == "street.1"
    assert res[0]["place_name"] == "main street, funtown"
    assert res[0]["context"] == ["place.2"]
