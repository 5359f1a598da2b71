"""Duplicate-address semantics — port of
/root/reference/test/acceptance/geocode-unit.duplicate-address.test.js
plus the street-fallback rendering cases of
geocode-unit.address-street-fallback.test.js.

Pins four behaviors the fixture exercises together:
- a house number duplicated INSIDE one cluster yields one result per
  matching point (addresscluster.js:61-115 forward returns every
  best-rank hit);
- number-bearing words never fuzzy-match ('101 main st' must not
  return a feature NAMED '103 main st' — the reference's fuzzy store
  exempts digit words from edits);
- uniqueAddressId dedupe (format-features.js:320-374): a cluster hit
  and its differently-spelled street twin reached via the same matched
  phrase collapse even though their place_names differ, with the
  non-omitted replacement preference (format-features.js:268-285) and
  the omitted sort demotion (verifymatch.js:1015-1024);
- cluster/range present but number missed → street fallback with the
  ×0.99 relevance penalty (verifymatch.js:489-492) rendered WITHOUT
  the number.
"""

import json

import pyarrow as pa
import pytest

from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans


def _pt(x, y, omitted=False):
    g = {"type": "Point", "coordinates": [x, y]}
    if omitted:
        g["omitted"] = True
    return json.dumps(g)


@pytest.fixture(scope="module")
def dup_index(ray_session):
    import ray.data as rd

    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import IndexData
    from carmen_ray.index.build import build_index

    rows = [
        # id 100/103: plain Point features NAMED '103 Main st', with
        # authored geometry.omitted (duplicate entries of cluster 101)
        ("address.100", _mk_spans([
            ("text", "103 Main st", ""),
            ("geom", _pt(4, 4, omitted=True), ""),
            ("center", "4,4", "")])),
        # id 101: the cluster — note '100' appears TWICE
        ("address.101", _mk_spans([
            ("text", "Main st", ""),
            ("geom", json.dumps({
                "type": "MultiPoint",
                "coordinates": [[0, 0], [1, 1], [2, 2], [3, 3], [4, 4]]}), ""),
            ("center", "0,0", ""),
            ("addr_numbers", "100,101,102,103,100", "")])),
        ("address.102", _mk_spans([
            ("text", "Main street", ""),
            ("geom", json.dumps({
                "type": "MultiPoint", "coordinates": [[4, 4]]}), ""),
            ("center", "0,0", ""),
            ("addr_numbers", "102", "")])),
        ("address.103", _mk_spans([
            ("text", "103 Main st", ""),
            ("geom", _pt(4, 4, omitted=True), ""),
            ("center", "4,4", "")])),
    ]
    cfg = GeocoderConfig(layers={
        "address": LayerConfig("address", zoom=6, geocoder_address=True,
                               geocoder_tokens={"Street": "st"}),
    })
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows]),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE))})
    idx = build_index(rd.from_arrow(tbl).repartition(1), config=cfg)
    return IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                     idx.layer_zooms, config=cfg)


def _names(index, q, allow_dupes):
    from carmen_ray.geocode.engine import forward_one

    return [(r["place_name"], r["feature_id"]) for r in
            forward_one(index, q, limit=10, allow_dupes=allow_dupes)]


def test_main_st_dupes(dup_index):
    res = _names(dup_index, "Main st", True)
    assert [n for n, _ in res] == ["Main st", "Main street"]


def test_main_st_no_dupes(dup_index):
    # 'Main street' matched via the same replaced phrase 'main st' —
    # the uniqueAddressId key collapses it despite the different name
    res = _names(dup_index, "Main st", False)
    assert [n for n, _ in res] == ["Main st"]


def test_101_main_st_dupes(dup_index):
    # the '103 Main st'-NAMED features must not appear: digit words
    # are exempt from fuzzy correction
    res = _names(dup_index, "101 Main st", True)
    assert [n for n, _ in res] == ["101 Main st", "Main street"]


def test_101_main_st_no_dupes(dup_index):
    res = _names(dup_index, "101 Main st", False)
    assert [n for n, _ in res] == ["101 Main st"]


def test_100_main_st_dupes(dup_index):
    # '100' is duplicated inside cluster 101 → two result points
    res = _names(dup_index, "100 Main st", True)
    assert [n for n, _ in res] == ["100 Main st", "100 Main st", "Main street"]
    assert res[0][1] == res[1][1] == "address.101"


def test_100_main_st_no_dupes(dup_index):
    res = _names(dup_index, "100 Main st", False)
    assert [n for n, _ in res] == ["100 Main st"]


def test_102_main_st_dupes(dup_index):
    res = _names(dup_index, "102 Main st", True)
    assert [n for n, _ in res] == ["102 Main st", "102 Main street"]


def test_102_main_st_no_dupes(dup_index):
    res = _names(dup_index, "102 Main st", False)
    assert [n for n, _ in res] == ["102 Main st"]


def test_103_main_street_dupes(dup_index):
    res = _names(dup_index, "103 Main street", True)
    assert [n for n, _ in res] == [
        "103 Main st", "103 Main st", "103 Main st", "Main street"]


def test_103_main_street_no_dupes_prefers_non_omitted(dup_index):
    res = _names(dup_index, "103 Main street", False)
    assert res == [("103 Main st", "address.101")]


def test_street_fallback_penalty(dup_index):
    """verifymatch.js:489-492: cluster present, number missed →
    street result at ×0.99 relevance, rendered without the number."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(dup_index, "104 Main st", limit=10,
                      allow_dupes=True)
    assert res, "street fallback expected"
    assert res[0]["place_name"] == "Main st"
    assert res[0]["address"] is None
    assert res[0]["relevance"] == pytest.approx(0.99)


# ---- address-street-fallback acceptance (multi-layer, with a place
# context and a geocoder_format template) -----------------------------


@pytest.fixture(scope="module")
def fallback_index(ray_session):
    import ray.data as rd

    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import IndexData
    from carmen_ray.index.build import build_index

    place_poly = json.dumps({"type": "Polygon", "coordinates": [[
        [-0.0117, -0.0112], [0.0135, -0.0112], [0.0135, 0.0086],
        [-0.0117, 0.0086], [-0.0117, -0.0112]]]})
    rows = [
        ("place.1", _mk_spans([
            ("text", "Springfield", ""),
            ("geom", place_poly, ""),
            ("center", "0,0", "")])),
        ("address.1", _mk_spans([
            ("text", "fake street", ""),
            ("geom", json.dumps({
                "type": "MultiPoint",
                "coordinates": [[0, 0], [0, 0], [0, 0]]}), ""),
            ("center", "0,0", ""),
            ("addr_numbers", "123,234,456", "")])),
    ]
    cfg = GeocoderConfig(
        layers={
            "place": LayerConfig("place", zoom=6),
            "address": LayerConfig("address", zoom=6, geocoder_address=True),
        },
        place_format="{address} {name} {context}")
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows]),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE))})
    idx = build_index(rd.from_arrow(tbl).repartition(1), config=cfg)
    return IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                     idx.layer_zooms, config=cfg)


def test_working_address(fallback_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(fallback_index, "123 fake street Springfield", limit=5)
    assert res[0]["place_name"] == "123 fake street Springfield"


def test_missing_number_falls_back_to_street(fallback_index):
    from carmen_ray.geocode.engine import forward_one

    for q in ("124 fake street Springfield", "123444 fake street Springfield"):
        res = forward_one(fallback_index, q, limit=5)
        assert res, q
        assert res[0]["place_name"] == "fake street Springfield", q
