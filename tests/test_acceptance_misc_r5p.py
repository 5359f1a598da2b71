"""Round-5 tranche 16: geocode-unit.address-properties.test.js —
carmen:addressprops per-cluster-point property overrides: base user
properties apply by default, point-indexed overrides replace them, and
a null override REMOVES the property for that point. Checked both
forward (number match picks the point) and reverse (nearest point)."""

import json

import pytest

from acceptance_util import _mk_spans, build_acceptance_index

_MP = json.dumps({"type": "MultiPoint",
                  "coordinates": [[0, 0], [1, 1], [2, 2], [3, 3]]})
_ADDRPROPS = json.dumps({"accuracy": {"1": "driveway", "2": "parcel",
                                      "3": "partial"}})


def _index(ray_session, with_base: bool, null_override: bool = False):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    cfg = GeocoderConfig(layers={
        "address": LayerConfig("address", zoom=6, geocoder_address=True)})
    spans = [
        ("text", "fake street", ""), ("geom", _MP, ""),
        ("center", "0,0", ""),
        ("addr_numbers", "9B,10C,7,3452", ""),
    ]
    if with_base:
        spans.append(("props", json.dumps({"accuracy": "rooftop"}), ""))
    ap = json.loads(_ADDRPROPS)
    if null_override:
        ap = {"accuracy": {"1": None}}
    spans.append(("addressprops", json.dumps(ap), ""))
    return build_acceptance_index([("address.1", _mk_spans(spans))], cfg)


@pytest.fixture(scope="module")
def props_index(ray_session):
    return _index(ray_session, with_base=True)


@pytest.mark.parametrize("q,expected", [
    ("9B FAKE STREET", "rooftop"),     # point 0: no override → base
    ("10C FAKE STREET", "driveway"),
    ("7 FAKE STREET", "parcel"),
    ("3452 FAKE STREET", "partial"),
])
def test_addressprops_forward(props_index, q, expected):
    """address-properties.test.js:29-77."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(props_index, q, limit=1)
    assert res and res[0]["properties"].get("accuracy") == expected


@pytest.mark.parametrize("pt,expected", [
    ((0.0, 0.0), "rooftop"),
    ((1.0, 1.0), "driveway"),
    ((2.0, 2.0), "parcel"),
    ((3.0, 3.0), "partial"),
])
def test_addressprops_reverse(props_index, pt, expected):
    """address-properties.test.js:80-100."""
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(props_index, pt[0], pt[1], limit=1)
    assert res and res[0]["properties"].get("accuracy") == expected


def test_addressprops_no_base(ray_session):
    """Without a base property, unoverridden points have no value
    (address-properties.test.js:130-160)."""
    from carmen_ray.geocode.engine import forward_one

    ix = _index(ray_session, with_base=False)
    res = forward_one(ix, "9B FAKE STREET", limit=1)
    assert res and "accuracy" not in res[0]["properties"]
    res = forward_one(ix, "10C FAKE STREET", limit=1)
    assert res and res[0]["properties"].get("accuracy") == "driveway"


def test_addressprops_null_removes(ray_session):
    """A null override removes the base property for that point
    (address-properties.test.js:200-260)."""
    from carmen_ray.geocode.engine import forward_one

    ix = _index(ray_session, with_base=True, null_override=True)
    res = forward_one(ix, "9B FAKE STREET", limit=1)
    assert res and res[0]["properties"].get("accuracy") == "rooftop"
    res = forward_one(ix, "10C FAKE STREET", limit=1)
    assert res and "accuracy" not in res[0]["properties"]
