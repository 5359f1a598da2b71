"""verifyContext exemptions: geocoder_ignore_order (verifymatch.js:
805-811) and close-but-no-cigar half credit (verifymatch.js:781-793,
903-930)."""

from __future__ import annotations

import json as _json

import pyarrow as pa
import pytest


def _doc(doc_id, text, geom, center, score):
    from carmen_ray.sources.synth import _mk_spans

    return {"doc_id": doc_id, "spans": _mk_spans([
        ("text", text, ""),
        ("geom", _json.dumps(geom), ""),
        ("center", center, ""),
        ("score", str(score), ""),
    ])}


def _build(rows):
    import ray.data as rd

    from carmen_ray.index.build import build_index
    from carmen_ray.sources.synth import SPAN_TYPE

    tbl = pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.string()),
        "spans": pa.array([r["spans"] for r in rows], type=pa.list_(SPAN_TYPE)),
    })
    return build_index(rd.from_arrow(tbl).repartition(1))


def _pt(lon, lat):
    return {"type": "Point", "coordinates": [lon, lat]}


def _poly(w, s, e, n):
    return {"type": "Polygon",
            "coordinates": [[[w, s], [e, s], [e, n], [w, n], [w, s]]]}


def test_ignore_order_skips_backy(ray_session):
    """With geocoder_ignore_order on the region layer, reversed query
    order scores the same as the canonical order."""
    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import IndexData, forward_one

    rows = [
        _doc("region.1", "westdale", _poly(40, 40, 42, 42), "41,41", 50),
        _doc("street.1", "pine walk", _pt(41.0, 41.0), "41,41", 10),
    ]
    idx = _build(rows)

    def relev(cfg, q):
        index = IndexData(idx.features, idx.phrase_grid, idx.freq,
                          idx.max_score, idx.layer_zooms, config=cfg)
        res = forward_one(index, q)
        mine = [r for r in res if r["feature_id"] == "street.1"]
        return mine[0]["relevance"] if mine else None

    plain = GeocoderConfig()
    asc = relev(plain, "pine walk westdale")
    desc = relev(plain, "westdale pine walk")
    assert asc is not None and desc is not None
    assert desc < asc  # descending order pays the direction cost

    ignoring = GeocoderConfig(layers={"region": LayerConfig(
        name="region", geocoder_ignore_order=True)})
    asc_i = relev(ignoring, "pine walk westdale")
    desc_i = relev(ignoring, "westdale pine walk")
    assert asc_i == desc_i  # exemption: order no longer matters


def test_close_but_no_cigar_half_credit(ray_session):
    """A stack cover matching a DIFFERENT feature of a chain layer gets
    half credit (zoom > 8), vs full credit when the cover matches the
    actual parent."""
    from carmen_ray.geocode.engine import IndexData, forward_one

    line_a = {"type": "MultiLineString",
              "coordinates": [[[50.0, 50.0], [50.01, 50.0]]]}
    line_b = {"type": "MultiLineString",
              "coordinates": [[[50.0, 49.999], [50.01, 49.999]]]}
    rows = [
        _doc("street.1", "oak ave", line_a, "50.005,50", 90),   # the poi's parent
        _doc("street.2", "main st", line_b, "50.005,49.999", 5),
        _doc("poi.1", "blue cafe", _pt(50.005, 50.0), "50.005,50", 20),
    ]
    idx = _build(rows)
    index = IndexData(idx.features, idx.phrase_grid, idx.freq,
                      idx.max_score, idx.layer_zooms)
    ctx = [c.doc_id for c in __import__(
        "carmen_ray.geocode.engine", fromlist=["_context_for"]
    )._context_for(index, index.doc_index["poi.1"], 99)]
    assert "street.1" in ctx  # oak ave is the chain street

    aligned = forward_one(index, "blue cafe oak ave")
    a = [r for r in aligned if r["feature_id"] == "poi.1"]
    # 1.0: street and poi are ADJACENT in this corpus's dense layer
    # ranks (no postcode/address layers present), so no gap penalty
    assert a and a[0]["relevance"] == pytest.approx(1.0)

    cigar = forward_one(index, "blue cafe main st")
    c = [r for r in cigar if r["feature_id"] == "poi.1"]
    assert c
    # half credit: strictly between the fully-aligned score and the
    # poi-only coverage (2 of 4 tokens)
    assert 0.5 < c[0]["relevance"] < a[0]["relevance"]
