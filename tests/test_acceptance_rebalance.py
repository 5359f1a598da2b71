"""Rebalance across a 4-token address query — port of
/root/reference/test/acceptance/geocode-unit.rebalance.test.js.

'11027 main st georgia 80138': the address (inside region georgia,
outside postcode 80138) beats the postcode stack even though the
postcode carries a score and the address none — rebalanced weights
favor the longer matched span.
"""

import json

import pytest

from acceptance_util import _mk_spans, build_acceptance_index, multipoint


def _poly(coords):
    return json.dumps({"type": "Polygon", "coordinates": [coords]})


@pytest.fixture(scope="module")
def rebalance_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    rows = [
        ("region.1", _mk_spans([
            ("text", "georgia", ""), ("center", "0,0", ""),
            ("score", "50", ""),
            ("geom", _poly([[-20, -20], [-20, 20], [20, 20], [20, -20],
                            [-20, -20]]), "")])),
        ("postcode.1", _mk_spans([
            ("text", "80138", ""), ("center", "-10,-10", ""),
            ("score", "50", ""),
            ("geom", _poly([[-20, -20], [-20, 0], [0, 0], [0, -20],
                            [-20, -20]]), "")])),
        ("address.1", _mk_spans([
            ("text", "Main St", ""), ("center", "10,10", ""),
            ("geom", multipoint((10.0, 10.0)), ""),
            ("addr_numbers", "11027", "")])),
    ]
    cfg = GeocoderConfig(layers={
        "region": LayerConfig("region", zoom=6),
        "postcode": LayerConfig("postcode", zoom=6),
        "address": LayerConfig("address", zoom=6, geocoder_address=True),
    })
    return build_acceptance_index(rows, cfg)


def test_address_beats_postcode(rebalance_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(rebalance_index, "11027 main st georgia 80138",
                      limit=2)
    assert len(res) == 2
    assert res[0]["feature_id"] == "address.1"
    assert res[1]["feature_id"] == "postcode.1"
    assert res[0]["relevance"] > res[1]["relevance"]
