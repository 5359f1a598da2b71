"""Ported from test/acceptance/geocode-unit.backy-exemption.test.js:
geocoder_ignore_order on the postcode layer exempts out-of-order
postcodes from the backy penalty while non-exempt layers still pay it."""

from __future__ import annotations

import json as _json

import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def pa_index(ray_session):
    import ray.data as rd

    from carmen_ray.index.build import build_index
    from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans

    def doc(doc_id, text, lon, lat, extra=()):
        spans = [("text", text, "")] + list(extra) + [
            ("geom", _json.dumps({"type": "Point", "coordinates": [lon, lat]}), ""),
            ("center", f"{lon},{lat}", ""),
            ("score", "10", ""),
        ]
        return {"doc_id": doc_id, "spans": _mk_spans(spans)}

    rows = [
        doc("region.2", "pennsylvania", 0.0, 0.0),
        doc("place.2", "linesville", 0.0, 0.0),
        doc("postcode.2", "16424", 0.0, 0.0),
        doc("address.2", "quincy lane", 0.0, 0.0,
            extra=[("addr_numbers", "2169", "")]),
    ]
    tbl = pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.string()),
        "spans": pa.array([
            r["spans"] for r in rows], type=pa.list_(SPAN_TYPE)),
    })
    return build_index(rd.from_arrow(tbl).repartition(1))


def _forward(idx, q, cfg):
    from carmen_ray.geocode.engine import IndexData, forward_one

    index = IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                      idx.layer_zooms, config=cfg)
    return forward_one(idx=index, query=q) if False else forward_one(index, q)


def test_backy_exemption_postcode(pa_index):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    cfg = GeocoderConfig(layers={"postcode": LayerConfig(
        name="postcode", geocoder_ignore_order=True)})

    canonical = _forward(pa_index, "2169 quincy lane linesville pennsylvania 16424", cfg)
    postcode_moved = _forward(pa_index, "2169 quincy lane 16424 linesville pennsylvania", cfg)
    assert canonical and canonical[0]["feature_id"] == "address.2"
    assert postcode_moved and postcode_moved[0]["feature_id"] == "address.2"
    # exempt layer out of order → NO backy penalty: both orders tie
    # (geocode-unit.backy-exemption.test.js:146-161)
    assert canonical[0]["relevance"] == postcode_moved[0]["relevance"]

    # non-exempt layers out of order (region before place) still pay
    # (geocode-unit.backy-exemption.test.js:164-190)
    nonexempt_moved = _forward(pa_index, "2169 quincy lane pennsylvania linesville 16424", cfg)
    assert nonexempt_moved and nonexempt_moved[0]["feature_id"] == "address.2"
    assert nonexempt_moved[0]["relevance"] < canonical[0]["relevance"]


def test_backy_without_exemption(pa_index):
    """Same queries with NO exemption: only the hierarchy-aligned order
    (postcode right after the address, i.e. walk-ascending) escapes the
    backy penalty; the display-canonical 'place region postcode' order
    pays it — which is exactly why the reference marks postcode
    geocoder_ignore_order in its default stack."""
    from carmen_ray.config import GeocoderConfig

    cfg = GeocoderConfig()
    postcode_last = _forward(pa_index, "2169 quincy lane linesville pennsylvania 16424", cfg)
    aligned = _forward(pa_index, "2169 quincy lane 16424 linesville pennsylvania", cfg)
    assert postcode_last and aligned
    assert postcode_last[0]["relevance"] < aligned[0]["relevance"]
