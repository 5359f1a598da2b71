"""Round-5 tranche 20: geocode-unit.address-preferred-order.test.js —
with geocoder_expected_number_order='first' and TWO number candidates
in the query, the first-position number is selected as the house
number (the sortContext addresspos preference); a single number works
from either end."""

import pytest

from acceptance_util import _mk_spans, build_acceptance_index, multipoint


@pytest.fixture(scope="module")
def preferred_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    cfg = GeocoderConfig(layers={
        "address": LayerConfig("address", zoom=6, geocoder_address=True,
                               geocoder_name="address",
                               geocoder_expected_number_order="first")})
    return build_acceptance_index([
        ("address.12345", _mk_spans([
            ("text", "15th Street Northeast", ""),
            ("geom", multipoint((-76.9, 38.8), (-76.91, 38.81)), ""),
            ("center", "-76.905,38.805", ""),
            ("score", "1", ""), ("stack", "us", ""),
            ("addr_numbers", "522,541", "")])),
    ], cfg)


@pytest.mark.parametrize("q,expected", [
    ("541 15th Street Northeast #522", "541"),
    ("522 15th Street Northeast #541", "522"),
    ("541 15th Street Northeast", "541"),
    ("15th Street Northeast 541", "541"),
])
def test_preferred_number_position(preferred_index, q, expected):
    """address-preferred-order.test.js:72-114."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(preferred_index, q, limit=1)
    assert res and res[0]["feature_id"] == "address.12345"
    assert res[0]["address"] == expected
