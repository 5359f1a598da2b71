"""Round-5 tranche 9: geocode-unit.jp-passthrough.test.js — a
Japanese unsegmented query with a numeric 丁目 block-token replacement
still routes the trailing house number to the address cluster
(regex geocoder_tokens with spanBoundaries + numTokenize passthrough,
phrasematch.js/verifymatch address plumbing)."""

import pytest

from acceptance_util import _mk_spans, build_acceptance_index, point

JP_TOKENS = {
    "(１０|10)丁目": {"regex": True, "spanBoundaries": 2, "text": "十丁目"},
    "[１1]丁目": {"regex": True, "spanBoundaries": 2, "text": "一丁目"},
    "[２2]丁目": {"regex": True, "spanBoundaries": 2, "text": "二丁目"},
    "[３3]丁目": {"regex": True, "spanBoundaries": 2, "text": "三丁目"},
    "[４4]丁目": {"regex": True, "spanBoundaries": 2, "text": "四丁目"},
    "[５5]丁目": {"regex": True, "spanBoundaries": 2, "text": "五丁目"},
    "[６6]丁目": {"regex": True, "spanBoundaries": 2, "text": "六丁目"},
    "[７7]丁目": {"regex": True, "spanBoundaries": 2, "text": "七丁目"},
    "[８8]丁目": {"regex": True, "spanBoundaries": 2, "text": "八丁目"},
    "[９9]丁目": {"regex": True, "spanBoundaries": 2, "text": "九丁目"},
}


@pytest.fixture(scope="module")
def jp_index(ray_session):
    import json

    from carmen_ray.config import GeocoderConfig, LayerConfig

    cfg = GeocoderConfig(
        tokens=JP_TOKENS,
        layers={
            "place": LayerConfig("place", zoom=6),
            "address": LayerConfig("address", zoom=6,
                                   geocoder_address=True,
                                   geocoder_name="address"),
        })
    tosu = json.dumps({"type": "Polygon", "coordinates": [[
        [128, 31], [132, 31], [132, 35], [128, 35], [128, 31]]]})
    return build_acceptance_index([
        ("address.12345", _mk_spans([
            ("text", "弥生が丘八丁目", ""),
            ("geom", json.dumps({"type": "MultiPoint", "coordinates": [
                [130.001, 33.001], [130.002, 33.002],
                [130.003, 33.003], [130.004, 33.004]]}), ""),
            ("center", "130.002,33.002", ""),
            ("score", "1", ""), ("stack", "jp", ""),
            ("addr_numbers", "6,1,16,26", "")])),
        ("place.2", _mk_spans([
            ("text", "鳥栖市", ""), ("geom", tosu, ""),
            ("center", "130,33", "")])),
    ], cfg)


def test_jp_house_number_passthrough(jp_index):
    """'鳥栖市弥生が丘8丁目1' → address.12345 with the trailing 1 as
    the house number (jp-passthrough.test.js:91-100)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(jp_index, "鳥栖市弥生が丘8丁目1", limit=1)
    assert res and res[0]["feature_id"] == "address.12345"
    assert res[0]["address"] == "1"
