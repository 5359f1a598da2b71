"""Round-5 tranche 19: geocode-unit.address-alphanumeric.test.js —
alphanumeric house numbers: cluster suffix matching ('9b' in a cluster,
'9b' against a plain-numeric cluster, '9b' against a TIGER range),
invalid suffixes falling back to the street, and a UK postcode not
being swallowed by a same-prefix address range."""

import json

import pytest

from acceptance_util import (_mk_spans, build_acceptance_index, multipoint,
                             tile_box, tile_center, tiles_poly)

C32 = tile_center(6, 32, 32)
CEN0 = f"{C32[0]},{C32[1]}"
B32 = tiles_poly(tile_box(6, 32, 32))
_LINE = json.dumps({"type": "LineString",
                    "coordinates": [[C32[0], C32[1]],
                                    [C32[0], C32[1] + 0.5]]})
_RANGE = json.dumps({"lfromhn": [["0"]], "ltohn": [["100"]]})


def _addr_index(ray_session, spans_extra):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    cfg = GeocoderConfig(layers={
        "address": LayerConfig("address", zoom=6, geocoder_address=True)})
    return build_acceptance_index([
        ("address.1", _mk_spans(
            [("text", "fake street", ""), ("center", CEN0, "")]
            + spans_extra)),
    ], cfg)


@pytest.mark.parametrize("q", ["9B FAKE STREET", "9b fake street"])
def test_alphanum_cluster(ray_session, q):
    """address-alphanumeric.test.js:17-40,123-146."""
    from carmen_ray.geocode.engine import forward_one

    ix = _addr_index(ray_session, [
        ("geom", multipoint(C32, C32, C32), ""),
        ("addr_numbers", "9b,10c,7", "")])
    res = forward_one(ix, q, limit=1)
    assert res and res[0]["place_name"] == "9b fake street"
    assert res[0]["relevance"] == pytest.approx(1.0)


def test_alphanum_query_numeric_cluster(ray_session):
    """'9b' matches a plain-numeric cluster entry 9
    (address-alphanumeric.test.js:153-177)."""
    from carmen_ray.geocode.engine import forward_one

    ix = _addr_index(ray_session, [
        ("geom", multipoint(C32, C32, C32), ""),
        ("addr_numbers", "9,10,7", "")])
    res = forward_one(ix, "9b fake street", limit=1)
    assert res and res[0]["place_name"] == "9b fake street"
    assert res[0]["relevance"] == pytest.approx(1.0)


@pytest.fixture(scope="module")
def range_index(ray_session):
    return _addr_index(ray_session, [
        ("geom", _LINE, ""), ("addr_range", _RANGE, "")])


def test_alphanum_range(range_index):
    """'9b' interpolates into a 0-100 TIGER range
    (address-alphanumeric.test.js:226-251)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(range_index, "9b fake street", limit=1)
    assert res and res[0]["place_name"] == "9b fake street"
    assert res[0]["relevance"] == pytest.approx(1.0)
    assert res[0]["address"] == "9b"


def test_alphanum_invalid_suffix_falls_back(range_index):
    """'9bc' is not a house number — street fallback under 0.6 with no
    address (address-alphanumeric.test.js:253-261)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(range_index, "9bc fake street", limit=1)
    assert res
    assert res[0]["relevance"] < 0.6
    assert res[0]["address"] is None


def test_uk_postcode_not_confused_with_range(ray_session):
    """'b77 1ab' → the postcode feature at relevance 1, not the 'B77'
    address range (address-alphanumeric.test.js:266-315)."""
    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import forward_one

    cfg = GeocoderConfig(layers={
        "postcode": LayerConfig("postcode", zoom=6),
        "address": LayerConfig("address", zoom=6, geocoder_address=True)})
    ix = build_acceptance_index([
        ("address.1", _mk_spans([
            ("text", "B77", ""), ("geom", _LINE, ""), ("center", CEN0, ""),
            ("addr_range", _RANGE, "")])),
        ("postcode.2", _mk_spans([
            ("text", "B77 1AB", ""), ("geom", B32, ""),
            ("center", CEN0, "")])),
    ], cfg)
    res = forward_one(ix, "b77 1ab", limit=1)
    assert res and res[0]["place_name"] == "B77 1AB"
    assert res[0]["feature_id"].startswith("postcode.")
    assert res[0]["relevance"] == pytest.approx(1.0)


@pytest.fixture(scope="module")
def washington_index(ray_session):
    """Two clusters on the same street (address-alphanumeric:44-87)."""
    from carmen_ray.config import GeocoderConfig, LayerConfig

    cfg = GeocoderConfig(layers={
        "address": LayerConfig("address", zoom=14, geocoder_address=True)})
    return build_acceptance_index([
        ("address.1", _mk_spans([
            ("text", "WASHINGTON STREET", ""),
            ("geom", multipoint(C32, C32, C32), ""), ("center", CEN0, ""),
            ("addr_numbers", "70,72,74", "")])),
        ("address.2", _mk_spans([
            ("text", "WASHINGTON STREET", ""),
            ("geom", multipoint(C32, C32, C32), ""), ("center", CEN0, ""),
            ("addr_numbers", "500,502,504", "")])),
    ], cfg)


@pytest.mark.parametrize("q,rel", [
    ("70 WASHINGTON STREET 502", 0.611111),
    ("70 WASHINGTON STREET #502", 0.611111),
    ("70 WASHINGTON STREET # 502", 0.611111),
    ("70 WASHINGTON STREET UNIT 502", 0.544444),
])
def test_double_number_unit_suffix(washington_index, q, rel):
    """A second number (unit/apartment) degrades relevance by exactly
    the unmatched-token weight (address-alphanumeric.test.js:89-114)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(washington_index, q, limit=1)
    assert res and res[0]["place_name"] == "70 WASHINGTON STREET"
    assert res[0]["relevance"] == pytest.approx(rel, abs=1e-6)


def test_hyphenated_range(ray_session):
    """'23-414' interpolates into a 23-100..23-500 semi-number range
    (address-alphanumeric.test.js:319-349)."""
    from carmen_ray.geocode.engine import forward_one

    ix = _addr_index(ray_session, [
        ("geom", _LINE, ""),
        ("addr_range", json.dumps({"lfromhn": [["23-100"]],
                                   "ltohn": [["23-500"]]}), ""),
    ])
    # the indexed text is 'fake street' in this harness; the reference
    # uses 'beach street' — the behavior under test is the semi-number
    # range resolution
    res = forward_one(ix, "23-414 fake street", limit=1)
    assert res and res[0]["place_name"] == "23-414 fake street"
    assert res[0]["relevance"] == pytest.approx(1.0)
