"""Round-5 tranche 15: geocode-unit.address-misc.test.js — mixed
GeometryCollection addresses (cluster MultiPoint + range
MultiLineString with per-line lfromhn/ltohn arrays and nulls):

- the Icelandic cluster matches forward through a diacritic-folded
  query ('3 Grundarstraeti' and the native '3 Grundarstræti');
- a reverse hit on a cluster point returns the STRING address.
"""

import json

import pytest

from acceptance_util import _mk_spans, build_acceptance_index

_GC = {
    "type": "GeometryCollection",
    "geometries": [{
        "type": "MultiLineString",
        "coordinates": [
            [[-22.991535, 66.026408], [-22.992236, 66.025768],
             [-22.992654, 66.025387], [-22.992876, 66.025237],
             [-22.992987, 66.02504], [-22.992954, 66.024872],
             [-22.992753, 66.024728], [-22.992217, 66.024552]],
            [[-22.990338, 66.026095], [-22.99048, 66.026126],
             [-22.990757, 66.026186], [-22.990825, 66.0262],
             [-22.991063, 66.026251], [-22.991535, 66.026408]]],
    }, {
        "type": "MultiPoint",
        "coordinates": [[-22.991473, 66.025805], [-22.991589, 66.025982],
                        [-22.990171, 66.026953]],
    }],
}

_RANGE = {
    "lfromhn": [["1", None]], "ltohn": [["3", None]],
    "parityl": [["O", None]],
    "rfromhn": [[None, "2"]], "rtohn": [[None, "2"]],
    "parityr": [[None, "E"]],
}


@pytest.fixture(scope="module")
def iceland_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    cfg = GeocoderConfig(layers={
        "address": LayerConfig("address", zoom=6, geocoder_address=True)})
    return build_acceptance_index([
        ("address.1", _mk_spans([
            ("text", "Grundarstræti", ""),
            ("geom", json.dumps(_GC), ""),
            ("center", "-22.992654,66.025387", ""),
            ("addr_numbers", "3,1,2", ""),
            ("addr_range", json.dumps(_RANGE), ""),
            ("stack", "is", "")])),
    ], cfg)


@pytest.mark.parametrize("q", ["3 Grundarstraeti", "3 Grundarstræti"])
def test_icelandic_cluster_forward(iceland_index, q):
    """address-misc.test.js:111-126."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(iceland_index, q, limit=1)
    assert res and res[0]["place_name"] == "3 Grundarstræti"
    assert res[0]["relevance"] == pytest.approx(1.0)


def test_reverse_string_address(iceland_index):
    """A reverse hit on a cluster point returns the string address
    (address-misc.test.js:169-177)."""
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(iceland_index, -22.991473, 66.025805, limit=1)
    assert res and res[0]["place_name"] == "3 Grundarstræti"
    assert res[0]["address"] == "3"
    assert isinstance(res[0]["address"], str)


@pytest.fixture(scope="module")
def german_index(ray_session):
    """address-misc.test.js:200-260: the straße splitter token with
    skipDiacriticStripping."""
    from carmen_ray.config import GeocoderConfig, LayerConfig

    cfg = GeocoderConfig(layers={
        "address": LayerConfig(
            "address", zoom=6, geocoder_address=True,
            geocoder_tokens={
                "([^ ]+)(strasse|str|straße)": {
                    "text": "$1 str", "regex": True,
                    "skipDiacriticStripping": True, "spanBoundaries": 0},
                "strasse": "str",
                "straße": "str",
            })})
    return build_acceptance_index([
        ("address.1", _mk_spans([
            ("text", "Wilhelmstraße", ""),
            ("geom", json.dumps(_GC), ""),
            ("center", "-22.992654,66.025387", ""),
            ("addr_numbers", "3,1,2", ""),
            ("addr_range", json.dumps(_RANGE), ""),
            ("stack", "de", "")])),
    ], cfg)


@pytest.mark.parametrize("q", ["Wilhelmstraße 3", "3 Wilhelmstraße",
                               "Wilhelmstrasse 3", "Wilhelm str 3"])
def test_german_strasse_variants(german_index, q):
    """address-misc.test.js:229-260: sharp-s, double-s and split
    spellings all hit the cluster at full relevance."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(german_index, q, limit=1)
    assert res and res[0]["place_name"] == "3 Wilhelmstraße"
    assert res[0]["relevance"] == pytest.approx(1.0)
