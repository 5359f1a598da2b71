"""Cluster-over-interpolation preference + empty-text noop — ports of
/root/reference/test/acceptance/geocode-unit.cluster-vs-range.test.js
and geocode-unit.featurenoop.test.js.

Two sources sharing geocoder_name 'address': a point-cluster hit beats
an otherwise-equal TIGER interpolation (verifymatch.js:1036-1046
sortContext cluster/interpolated preferences). A doc whose text is
whitespace-only is skipped at index time and never loads
(indexdocs text checks; the featurenoop fixture's '\\n' VT feature).
"""

import json

import pyarrow as pa
import pytest

from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans


@pytest.fixture(scope="module")
def cvr_index(ray_session):
    import ray.data as rd

    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import IndexData
    from carmen_ray.index.build import build_index

    rows = [
        # declared FIRST so a bare idx tie-break would wrongly win
        ("addressitp.1", _mk_spans([
            ("text", "fake street", ""),
            ("geom", json.dumps({"type": "LineString",
                                 "coordinates": [[0, 0], [0, 1]]}), ""),
            ("center", "0,0", ""),
            ("addr_range", json.dumps({
                "rfromhn": [["1"]], "rtohn": [["191"]], "parityr": [["O"]],
                "lfromhn": [["0"]], "ltohn": [["190"]], "parityl": [["E"]],
            }), "")])),
        ("address.1", _mk_spans([
            ("text", "fake street", ""),
            ("geom", json.dumps({"type": "MultiPoint",
                                 "coordinates": [[0, 0]]}), ""),
            ("center", "0,0", ""),
            ("addr_numbers", "100", "")])),
    ]
    cfg = GeocoderConfig(layers={
        "addressitp": LayerConfig("addressitp", zoom=6,
                                  geocoder_address=True,
                                  geocoder_name="address"),
        "address": LayerConfig("address", zoom=6, geocoder_address=True,
                               geocoder_name="address"),
    })
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows]),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE))})
    idx = build_index(rd.from_arrow(tbl).repartition(1), config=cfg)
    return IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                     idx.layer_zooms, config=cfg)


def test_cluster_beats_interpolation(cvr_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(cvr_index, "100 fake street", limit=2,
                      allow_dupes=True)
    assert res[0]["place_name"] == "100 fake street"
    assert res[0]["relevance"] == 1.0
    assert res[0]["interpolated"] is False
    # the ITP twin resolves 100 inside 0-190 at equal relevance but
    # sorts second on the interpolated preference
    assert len(res) >= 2
    assert res[1]["place_name"] == "100 fake street"
    assert res[1]["interpolated"] is True


def test_reverse_prefers_cluster_point(cvr_index):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(cvr_index, 0.0, 0.0, limit=1)
    assert res and res[0]["place_name"] == "100 fake street"


def test_whitespace_only_text_never_indexes(ray_session):
    import ray.data as rd

    from carmen_ray.geocode.engine import IndexData, reverse_one
    from carmen_ray.index.build import build_index

    rows = [("poi.1", _mk_spans([
        ("text", "\n", ""),
        ("geom", json.dumps({"type": "Point", "coordinates": [0, 0]}), ""),
        ("center", "0,0", "")]))]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows]),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE))})
    idx = build_index(rd.from_arrow(tbl).repartition(1))
    index = IndexData(idx.features, idx.phrase_grid, idx.freq,
                      idx.max_score, idx.layer_zooms)
    assert reverse_one(index, 0.0, 0.0, limit=1) == []
