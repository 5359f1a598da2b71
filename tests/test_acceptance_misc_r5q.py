"""Round-5 tranche 17: geocode-unit.address-sort-interpolated.test.js
— a real cluster point beats a TIGER interpolation of the same number
on a same-named street, and the place-name dedupe collapses the
interpolated twin ('Main St'/'Main Street' share the token-replaced
phrase)."""

import json

import pytest

from acceptance_util import _mk_spans, build_acceptance_index

_LINE = {"type": "MultiLineString",
         "coordinates": [[[-97.2, 37.2], [-97.2, 37.4]]]}
_RANGE = json.dumps({
    "lfromhn": [["100"]], "ltohn": [["200"]], "parityl": [["E"]],
    "rfromhn": [["101"]], "rtohn": [["199"]], "parityr": [["O"]],
})


@pytest.fixture(scope="module")
def sort_itp_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    cfg = GeocoderConfig(layers={
        "address": LayerConfig("address", zoom=6, geocoder_address=True,
                               geocoder_tokens={"Street": "St"})})
    gc1 = json.dumps({"type": "GeometryCollection", "geometries": [
        _LINE, {"type": "MultiPoint",
                "coordinates": [[-97.2, 37.2], [-97.2, 37.4]]}]})
    gc2 = json.dumps({"type": "GeometryCollection", "geometries": [
        _LINE, {"type": "MultiPoint", "coordinates": [[-97.2, 37.3]]}]})
    return build_acceptance_index([
        ("address.1", _mk_spans([
            ("text", "Main St", ""), ("geom", gc1, ""),
            ("center", "-97.2,37.3", ""),
            ("addr_numbers", "100,200", ""), ("addr_range", _RANGE, "")])),
        ("address.2", _mk_spans([
            ("text", "Main Street", ""), ("geom", gc2, ""),
            ("center", "-97.2,37.3", ""),
            ("addr_numbers", "150", ""), ("addr_range", _RANGE, "")])),
    ], cfg)


def test_noninterpolated_sorts_first(sort_itp_index):
    """address-sort-interpolated.test.js:100-110."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(sort_itp_index, "150 Main St", limit=2,
                      allow_dupes=True)
    assert len(res) == 2
    assert res[0]["feature_id"] == "address.2"
    assert not res[0]["interpolated"]
    assert res[1]["feature_id"] == "address.1"
    assert res[1]["interpolated"]


def test_interpolated_twin_dedupes(sort_itp_index):
    """address-sort-interpolated.test.js:112-120."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(sort_itp_index, "150 Main St", limit=2)
    assert len(res) == 1
    assert res[0]["feature_id"] == "address.2"
    assert not res[0]["interpolated"]
