"""Layer fallback — port of
/root/reference/test/acceptance/geocode-unit.fallback.test.js.

A query whose address tokens point at one city (Cold City) while its
postcode/place/region tokens line up with another (Seattle, Washington)
falls back to the geographically-consistent coarse stack instead of the
token-richer but context-mismatched address."""

import json

import pyarrow as pa
import pytest

from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans

MPT_COLD = json.dumps({"type": "MultiPoint", "coordinates": [[10, 0]]})
PT_COLD = json.dumps({"type": "Point", "coordinates": [10, 0]})
PT_SEA = json.dumps({"type": "Point", "coordinates": [0, 0]})


@pytest.fixture(scope="module")
def fb_index(ray_session):
    import ray.data as rd

    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import IndexData
    from carmen_ray.index.build import build_index

    rows = [
        ("place.105", _mk_spans([("text", "Cold City", ""),
                                 ("geom", PT_COLD, ""), ("center", "10,0", "")])),
        ("address.100", _mk_spans([("text", "Main St", ""),
                                   ("geom", MPT_COLD, ""), ("center", "10,0", ""),
                                   ("addr_numbers", "100", "")])),
        ("address.101", _mk_spans([("text", "Market", ""),
                                   ("geom", MPT_COLD, ""), ("center", "10,0", ""),
                                   ("addr_numbers", "100", "")])),
        ("place.100", _mk_spans([("text", "Seattle", ""),
                                 ("geom", PT_SEA, ""), ("center", "0,0", "")])),
        ("postcode.100", _mk_spans([("text", "12345", ""),
                                    ("geom", PT_SEA, ""), ("center", "0,0", "")])),
        ("region.100", _mk_spans([("text", "Washington", ""),
                                  ("geom", PT_SEA, ""), ("center", "0,0", "")])),
    ]
    cfg = GeocoderConfig(layers={
        "region": LayerConfig("region", zoom=6),
        "place": LayerConfig("place", zoom=6),
        "postcode": LayerConfig("postcode", zoom=6),
        "address": LayerConfig("address", zoom=6, geocoder_address=True),
    })
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows]),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE))})
    idx = build_index(rd.from_arrow(tbl).repartition(1), config=cfg)
    return IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                     idx.layer_zooms, config=cfg)


def test_3v3_postcode_wins(fb_index):
    """'100 Main St, 12345 Seattle, Washington' → postcode stack
    (fallback.test.js:124-132)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(fb_index, "100 Main St, 12345 Seattle, Washington",
                      limit=1)
    assert res[0]["feature_id"] == "postcode.100"
    assert res[0]["place_name"] == "12345, Seattle, Washington"


def test_2v3_postcode_wins(fb_index):
    """'100 Market 12345 Seattle Washington' → postcode stack
    (fallback.test.js:135-143)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(fb_index, "100 Market 12345 Seattle Washington",
                      limit=1)
    assert res[0]["feature_id"] == "postcode.100"
    assert res[0]["place_name"] == "12345, Seattle, Washington"


def test_3v2_place_wins(fb_index):
    """'100 Main St, Seattle Washington': the 3-token address match in
    the WRONG city loses to the 2-token Seattle place stack
    (fallback.test.js:146-154)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(fb_index, "100 Main St, Seattle Washington", limit=1)
    assert res[0]["feature_id"] == "place.100"
    assert res[0]["place_name"] == "Seattle, Washington"
