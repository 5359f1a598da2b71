"""Reverse address snap (context.js:694-716, addresscluster.js reverse,
addressitp.js reverse) and the queens address style vtable
(addresscluster.js:383-420)."""

from __future__ import annotations

import json as _json

import pyarrow as pa
import pytest


def _doc(doc_id, spans):
    from carmen_ray.sources.synth import _mk_spans

    return {"doc_id": doc_id, "spans": _mk_spans(spans)}


def _build(rows, ray_session=None):
    import ray.data as rd

    from carmen_ray.index.build import build_index
    from carmen_ray.sources.synth import SPAN_TYPE

    tbl = pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.string()),
        "spans": pa.array([r["spans"] for r in rows], type=pa.list_(SPAN_TYPE)),
    })
    return build_index(rd.from_arrow(tbl).repartition(1))


CLUSTER_GEOM = {
    "type": "MultiPoint",
    "coordinates": [[10.0, 10.0], [10.001, 10.0], [10.002, 10.0]],
}


@pytest.fixture(scope="module")
def addr_index(ray_session):
    rows = [
        _doc("address.1", [
            ("text", "oak lane", ""),
            ("addr_numbers", "100,102,104", ""),
            ("geom", _json.dumps(CLUSTER_GEOM), ""),
            ("center", "10.001,10", ""),
            ("score", "5", ""),
        ]),
    ]
    idx = _build(rows)
    from carmen_ray.geocode.engine import IndexData

    return IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                     idx.layer_zooms)


def test_reverse_snaps_to_cluster_point(addr_index):
    """Reverse near the 3rd cluster point returns its housenumber and
    snapped coordinates (addresscluster.js reverse)."""
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(addr_index, 10.0021, 10.00001)
    assert res
    top = res[0]
    assert top["feature_id"] == "address.1"
    assert top["address"] == "104"
    assert abs(top["center_lon"] - 10.002) < 1e-9
    assert top["place_name"].startswith("104 oak lane")


def test_reverse_itp_interpolates_number(ray_session):
    """Reverse onto a TIGER range line interpolates the housenumber for
    the correct street side with parity rounding (addressitp.js
    reverse:178-268)."""
    line_geom = {
        "type": "MultiLineString",
        "coordinates": [[[20.0, 20.0], [20.01, 20.0]]],
    }
    rows = [
        _doc("address.2", [
            ("text", "elm road", ""),
            ("addr_range", _json.dumps({
                "lfromhn": [["1"]], "ltohn": [["99"]], "parityl": ["O"],
                "rfromhn": [["2"]], "rtohn": [["100"]], "parityr": ["E"],
            }), ""),
            ("geom", _json.dumps(line_geom), ""),
            ("center", "20.005,20", ""),
            ("score", "5", ""),
        ]),
    ]
    idx = _build(rows)
    from carmen_ray.geocode.engine import IndexData, reverse_one

    index = IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                      idx.layer_zooms)
    # query slightly NORTH of the west-to-east line → left side → odd
    res = reverse_one(index, 20.005, 20.0005)
    assert res and res[0]["address"] is not None
    num = int(res[0]["address"])
    assert num % 2 == 1  # left side parity O
    assert 40 <= num <= 60  # ~midway along the 1..99 range
    # south of the line → right side → even
    res2 = reverse_one(index, 20.005, 19.9995)
    num2 = int(res2[0]["address"])
    assert num2 % 2 == 0
    assert 40 <= num2 <= 60


def test_queens_address_style(ray_session):
    """Queens vtable: '71-05' raw/hyphenated matching plus numeric
    fallback without a hyphen; standard style rejects the same query
    (addresscluster.js:383-420)."""
    geom = {"type": "MultiPoint",
            "coordinates": [[30.0, 30.0], [30.001, 30.0]]}
    rows = [
        _doc("address.3", [
            ("text", "queens blvd", ""),
            ("addr_numbers", "71-05,71-07", ""),
            ("address_style", "queens", ""),
            ("geom", _json.dumps(geom), ""),
            ("center", "30,30", ""),
            ("score", "5", ""),
        ]),
        _doc("address.4", [
            ("text", "standard ave", ""),
            ("addr_numbers", "71-05", ""),
            ("geom", _json.dumps({"type": "MultiPoint",
                                  "coordinates": [[31.0, 31.0]]}), ""),
            ("center", "31,31", ""),
            ("score", "5", ""),
        ]),
    ]
    idx = _build(rows)
    from carmen_ray.geocode.engine import IndexData, match_address_cluster

    index = IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                      idx.layer_zooms)
    queens = index.feature_at(index.doc_index["address.3"])
    standard = index.feature_at(index.doc_index["address.4"])

    assert match_address_cluster(queens, "71-05") == 0   # raw match
    assert match_address_cluster(queens, "7105") == 0    # numeric fallback
    assert match_address_cluster(queens, "71-07") == 1
    # standard style: raw ≠, numeric-of-query '7105' ≠ raw '71-05',
    # initial numeric '7105' ≠ '71' → no match
    assert match_address_cluster(standard, "7105") is None
    assert match_address_cluster(standard, "71-05") == 0  # raw still works
