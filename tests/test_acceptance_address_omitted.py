"""ITP gap interpolation + omitted ordering — port of
/root/reference/test/acceptance/geocode-unit.address-omitted.test.js.

A house number falling in the GAP between two TIGER ranges still
interpolates, flagged omitted (addressitp.js:401-438 setPoint); an
omitted result sorts after a non-omitted twin unless proximity puts
only the omitted one inside the coalesce radius
(verifymatch.js:1015-1024 sortContext omittedDifference gating).
"""

import json

import pyarrow as pa
import pytest

from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans


def _range_spans(text, lines, froms, tos):
    return _mk_spans([
        ("text", text, ""),
        ("geom", json.dumps({"type": "MultiLineString",
                             "coordinates": lines}), ""),
        ("center", f"{lines[0][0][0]},{lines[0][0][1]}", ""),
        ("addr_range", json.dumps({
            "lfromhn": [[f] for f in froms],
            "ltohn": [[t] for t in tos],
        }), ""),
    ])


@pytest.fixture(scope="module")
def itp_gap_index(ray_session):
    import ray.data as rd

    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import IndexData
    from carmen_ray.index.build import build_index

    rows = [
        # 'fake street': two ranges 0-100 / 104-200 with a gap at 102
        ("address.1", _range_spans(
            "fake street",
            [[[0, 0], [0, 0.5]], [[0, 0.6], [0, 0.8]]],
            ["0", "104"], ["100", "200"])),
        # 'far street': one continuous range covering 102
        ("address.2", _range_spans(
            "far street",
            [[[0, 0.5], [0, 1]]],
            ["0"], ["200"])),
    ]
    cfg = GeocoderConfig(layers={
        "address": LayerConfig("address", zoom=14, geocoder_address=True),
    })
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows]),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE))})
    idx = build_index(rd.from_arrow(tbl).repartition(1), config=cfg)
    return IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                     idx.layer_zooms, config=cfg)


def _run(index, q, proximity=None):
    from carmen_ray.geocode.engine import forward_one

    return forward_one(index, q, proximity=proximity, limit=5)


def test_gap_number_interpolates_omitted(itp_gap_index):
    res = _run(itp_gap_index, "102 fake street")
    assert res and res[0]["place_name"] == "102 fake street"
    assert res[0]["omitted"] is True
    assert res[0]["interpolated"] is True


def test_in_range_number_not_omitted(itp_gap_index):
    res = _run(itp_gap_index, "102 far street")
    assert res and res[0]["place_name"] == "102 far street"
    assert res[0]["omitted"] is False


def test_no_proximity_non_omitted_first(itp_gap_index):
    res = _run(itp_gap_index, "102 f")
    assert len(res) == 2
    assert res[0]["feature_id"] == "address.2"
    assert res[0]["omitted"] is False
    assert res[1]["feature_id"] == "address.1"
    assert res[1]["omitted"] is True


def test_close_proximity_promotes_omitted(itp_gap_index):
    # the omitted gap point sits right by the proximity point — only it
    # is inside the radius, so scoredist outranks the omitted demotion
    res = _run(itp_gap_index, "102 f", proximity=(0, 0.5))
    assert len(res) == 2
    assert res[0]["feature_id"] == "address.1"
    assert res[0]["omitted"] is True
    assert res[1]["feature_id"] == "address.2"


def test_far_proximity_keeps_non_omitted_first(itp_gap_index):
    # both outside the radius → the omitted demotion applies even
    # though the omitted feature is geometrically closer
    res = _run(itp_gap_index, "102 f", proximity=(0, -3))
    assert len(res) == 2
    assert res[0]["feature_id"] == "address.2"
    assert res[1]["feature_id"] == "address.1"
    assert res[1]["omitted"] is True
