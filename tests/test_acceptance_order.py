"""Query order (backy penalty) — port of
/root/reference/test/acceptance/geocode-unit.order.test.js.

Ascending '{place} {region}' keeps relevance 1; unexpected descending
order takes the 0.01 backy penalty (0.99); a mixed-up address query
pins 0.843915 exactly; and features matching in both directions are
both returned, expected order first."""

import json

import pyarrow as pa
import pytest

from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans

PT0 = json.dumps({"type": "Point", "coordinates": [0, 0]})
MPT0 = json.dumps({"type": "MultiPoint", "coordinates": [[0, 0]]})


@pytest.fixture(scope="module")
def order_index(ray_session):
    import ray.data as rd

    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import IndexData
    from carmen_ray.index.build import build_index

    rows = [
        ("country.1", _mk_spans([("text", "United States", ""),
                                 ("geom", PT0, ""), ("center", "0,0", "")])),
        ("region.1", _mk_spans([("text", "North Carolina", ""),
                                ("geom", PT0, ""), ("center", "0,0", "")])),
        ("place.1", _mk_spans([("text", "Winston-Salem", ""),
                               ("geom", PT0, ""), ("center", "0,0", "")])),
        ("address.1", _mk_spans([("text", "Log Cabin Ln", ""),
                                 ("geom", MPT0, ""), ("center", "0,0", ""),
                                 ("addr_numbers", "1234", "")])),
        ("poi.2", _mk_spans([("text", "United States", ""),
                             ("geom", PT0, ""), ("center", "0,0", "")])),
    ]
    cfg = GeocoderConfig(layers={
        "address": LayerConfig("address", zoom=6, geocoder_address=True)})
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows]),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE))})
    idx = build_index(rd.from_arrow(tbl).repartition(1), config=cfg)
    return IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                     idx.layer_zooms, config=cfg)


def test_ascending_order_full_relevance(order_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(order_index, "Winston-Salem North Carolina", limit=1)
    assert res[0]["feature_id"] == "place.1"
    assert res[0]["relevance"] == 1.0


def test_descending_order_backy_penalty(order_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(order_index, "North Carolina Winston-Salem", limit=1)
    assert res[0]["feature_id"] == "place.1"
    assert res[0]["relevance"] == 0.99


def test_mixed_order_pins_relevance(order_index):
    """order.test.js:115-122 pins 0.843915 exactly."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(order_index,
                      "Log Cabin Ln North Carolina Winston-Salem", limit=2)
    assert res[0]["feature_id"] == "address.1"
    assert res[0]["relevance"] == 0.843915


def test_both_directions_returned_region_first(order_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(order_index, "North Carolina United States", limit=2,
                      allow_dupes=True)
    assert len(res) == 2
    assert res[0]["feature_id"] == "region.1"


def test_descending_gappy_poi_first(order_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(order_index, "United States Winston-Salem", limit=2,
                      allow_dupes=True)
    assert len(res) == 2
    assert res[0]["feature_id"] == "poi.2"
