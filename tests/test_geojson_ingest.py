"""NDJSON GeoJSON ingestion (the reference's native input format,
bin/carmen-index.js:19-53): carmen:* features stream through
read_geojson_docs into the input_hint span shape, index end-to-end,
and geocode; runChecks validation parity
(lib/indexer/indexdocs.js:164-212)."""

from __future__ import annotations

import json

import pytest


def _write_ndjson(path, docs):
    with open(path, "w") as fh:
        for d in docs:
            fh.write(json.dumps(d) + "\n")
    return str(path)


PLACE = {
    "id": 1, "type": "Feature",
    "properties": {"carmen:text": "springfield", "carmen:center": [10.0, 10.0],
                   "carmen:score": 100, "carmen:text_es": "springfieldo"},
    "geometry": {"type": "Polygon",
                 "coordinates": [[[8, 8], [12, 8], [12, 12], [8, 12], [8, 8]]]},
}
STREET = {
    "id": 7, "type": "Feature",
    "properties": {"carmen:text": "fake st,fake street",
                   "carmen:center": [10.0, 10.01]},
    "geometry": {"type": "LineString",
                 "coordinates": [[9.99, 10.01], [10.01, 10.01]]},
}
ADDR = {
    "id": 9, "type": "Feature",
    "properties": {"carmen:text": "fake st", "carmen:center": [10.0, 10.02],
                   "carmen:score": 5, "carmen:addressnumber": [[3, 5, 7]]},
    "geometry": {"type": "GeometryCollection", "geometries": [
        {"type": "MultiPoint",
         "coordinates": [[10.0, 10.02], [10.002, 10.02], [10.004, 10.02]]}]},
}


def test_geojson_end_to_end(ray_session, tmp_path):
    from carmen_ray.geocode.engine import IndexData, forward_one
    from carmen_ray.index.build import build_index
    from carmen_ray.sources.io import read_geojson_docs

    p = _write_ndjson(tmp_path / "place.ndjson", [PLACE])
    s = _write_ndjson(tmp_path / "street.ndjson", [STREET])
    a = _write_ndjson(tmp_path / "address.ndjson", [ADDR])

    docs = (read_geojson_docs(p, "place")
            .union(read_geojson_docs(s, "street"), read_geojson_docs(a, "address")))
    index = build_index(docs)
    idx = IndexData(index.features, index.phrase_grid, index.freq,
                    index.max_score, index.layer_zooms)

    r = forward_one(idx, "springfield")
    assert r and r[0]["feature_id"] == "place.1"

    r = forward_one(idx, "fake street")  # second comma synonym indexed
    assert r and r[0]["feature_id"] == "street.7"
    assert "springfield" in r[0]["place_name"]  # context stacks over place

    r = forward_one(idx, "5 fake st")    # address-cluster resolution
    assert r and r[0]["feature_id"] == "address.9"
    assert r[0]["address"] == "5"


def test_geojson_span_sequence(ray_session, tmp_path):
    """Span encoding parity with sources/synth: kinds, order, offsets."""
    from carmen_ray.sources.io import geojson_doc_to_spans

    doc_id, spans = geojson_doc_to_spans(STREET, "street")
    assert doc_id == "street.7"
    kinds = [s["kind"] for s in spans]
    assert kinds == ["text", "synonym", "geom", "center", "score"]
    assert [s["offset"] for s in spans] == list(range(len(spans)))
    assert spans[0]["text"] == "fake st"
    assert spans[1]["text"] == "fake street"

    _, aspans = geojson_doc_to_spans(ADDR, "address")
    by_kind = {s["kind"]: s["text"] for s in aspans}
    assert by_kind["addr_numbers"] == "3,5,7"
    # GeometryCollection unwrapped to the MultiPoint member
    assert json.loads(by_kind["geom"])["type"] == "MultiPoint"

    _, pspans = geojson_doc_to_spans(PLACE, "place")
    pk = {s["kind"]: s["text"] for s in pspans}
    assert pk["lang:es"] == "springfieldo"


@pytest.mark.parametrize("mutate,msg", [
    (lambda d: d.pop("id"), "doc has no id"),
    (lambda d: d.pop("geometry"), "doc has no geometry"),
    (lambda d: d.pop("properties"), "doc has no properties"),
    (lambda d: d["properties"].pop("carmen:text"), "doc has no carmen:text"),
    (lambda d: d["properties"].update({"carmen:geocoder_stack": 42}),
     "geocoder_stack must be a string"),
])
def test_geojson_runchecks(mutate, msg):
    from carmen_ray.sources.io import validate_geojson_doc

    doc = json.loads(json.dumps(PLACE))
    mutate(doc)
    with pytest.raises(ValueError, match=msg):
        validate_geojson_doc(doc)


def test_geojson_vertex_cap():
    from carmen_ray.sources.io import validate_geojson_doc

    ring = [[float(i % 360 - 180), float(i % 170 - 85)] for i in range(50001)]
    doc = {"id": 5, "type": "Feature",
           "properties": {"carmen:text": "big"},
           "geometry": {"type": "Polygon", "coordinates": [ring]}}
    with pytest.raises(ValueError, match="50k vertices"):
        validate_geojson_doc(doc)


def test_geojson_synonym_cap_address_only():
    """>10 synonyms only fails for address-style docs (runChecks)."""
    from carmen_ray.sources.io import validate_geojson_doc

    many = ",".join(f"n{i}" for i in range(12))
    plain = {"id": 2, "type": "Feature",
             "properties": {"carmen:text": many},
             "geometry": {"type": "Point", "coordinates": [0, 0]}}
    validate_geojson_doc(plain)  # allowed: not address-style
    addr = json.loads(json.dumps(plain))
    addr["properties"]["carmen:addressnumber"] = [["1"]]
    with pytest.raises(ValueError, match="more than the allowed"):
        validate_geojson_doc(addr)
