"""geocoder_type / name-group conflicts in reverse context — port of
/root/reference/test/acceptance/geocode-unit.geocoder_type.test.js.

Same-name (geocoder_name) different-type (geocoder_type) sources
CONFLICT when stacking a reverse context: claiming a type also claims
the name group (carmen:conflict, context.js:652), and a closer
non-polygon feature evicts the holder (context.js:216-238) unless the
holder's type was explicitly requested. Overlapping same-layer
polygons tie-break by centroid distance.
"""

import json

import pytest

from acceptance_util import _mk_spans, build_acceptance_index, multipoint, point

ADDR = (-77.04312264919281, 38.91041215085371)
POI1 = (-77.04441547393799, 38.909427030614665)
POI3 = (-77.04320579767227, 38.910435109001334)


def _rows(poi_center):
    return [
        ("address.1", _mk_spans([
            ("text", "fake street", ""),
            ("geom", multipoint(ADDR), ""),
            ("center", f"{ADDR[0]},{ADDR[1]}", ""),
            ("addr_numbers", "100", "")])),
        ("poi.1", _mk_spans([
            ("text", "big bank", ""),
            ("geom", point(*poi_center), ""),
            ("center", f"{poi_center[0]},{poi_center[1]}", "")])),
    ]


@pytest.fixture(scope="module")
def plain_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    cfg = GeocoderConfig(layers={
        "address": LayerConfig("address", zoom=12, geocoder_address=True),
        "poi": LayerConfig("poi", zoom=12),
    })
    return build_acceptance_index(_rows(POI1), cfg)


@pytest.fixture(scope="module")
def conflict_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    cfg = GeocoderConfig(layers={
        "address": LayerConfig("address", zoom=12, geocoder_name="address",
                               geocoder_type="address", geocoder_address=True),
        "poi": LayerConfig("poi", zoom=12, geocoder_name="address",
                           geocoder_type="poi"),
    })
    return build_acceptance_index(_rows(POI1), cfg)


@pytest.fixture(scope="module")
def near_conflict_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    cfg = GeocoderConfig(layers={
        "address": LayerConfig("address", zoom=12, geocoder_name="address",
                               geocoder_type="address", geocoder_address=True),
        "poi": LayerConfig("poi", zoom=12, geocoder_name="address",
                           geocoder_type="poi"),
    })
    return build_acceptance_index(_rows(POI3), cfg)


def test_plain_reverse_poi_tops_by_index_order(plain_index):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(plain_index, *ADDR, split_context=True)
    assert res[0]["place_name"] == "big bank, fake street"
    assert res[0]["relevance"] == 1


def test_plain_reverse_type_poi(plain_index):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(plain_index, *ADDR, types=["poi"], split_context=True)
    assert res[0]["place_name"] == "big bank, fake street"


def test_plain_reverse_type_address(plain_index):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(plain_index, *POI1, types=["address"],
                      split_context=True)
    assert res[0]["place_name"] == "100 fake street"


def test_conflict_address_query_returns_address(conflict_index):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(conflict_index, *ADDR, split_context=True)
    assert res[0]["place_name"] == "100 fake street"
    assert res[0]["relevance"] == 1
    # the poi was evicted from the chain, not stacked as context
    assert res[0]["context"] == []


def test_conflict_poi_query_returns_poi(conflict_index):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(conflict_index, *POI1, split_context=True)
    assert res[0]["place_name"] == "big bank"
    assert res[0]["context"] == []


def test_conflict_types_poi(conflict_index):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(conflict_index, *ADDR, types=["poi"],
                      split_context=True)
    assert len(res) == 1
    assert res[0]["place_name"] == "big bank"


def test_conflict_types_address(conflict_index):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(conflict_index, *POI1, types=["address"],
                      split_context=True)
    assert len(res) == 1
    assert res[0]["place_name"] == "100 fake street"


def test_near_conflict_type_filter_removes_address(near_conflict_index):
    """The closer address CANNOT bump the requested poi type
    (context.js:226 'a conflicting feature cannot bump out a wanted
    type')."""
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(near_conflict_index, *POI3, types=["poi"],
                      split_context=True)
    assert len(res) == 1
    assert res[0]["place_name"] == "big bank"


def test_near_conflict_type_filter_removes_poi(near_conflict_index):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(near_conflict_index, *ADDR, types=["address"],
                      split_context=True)
    assert len(res) == 1
    assert res[0]["place_name"] == "100 fake street"


def test_overlapping_places_closest_centroid(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import reverse_one

    box = json.dumps({"type": "Polygon", "coordinates": [[
        [-77.0387077331543, 38.90803281165565],
        [-77.0387077331543, 38.91167275087875],
        [-77.02815055847168, 38.91167275087875],
        [-77.02815055847168, 38.90803281165565],
        [-77.0387077331543, 38.90803281165565]]]})
    rows = [
        ("place.1", _mk_spans([
            ("text", "Logan Circle", ""), ("geom", box, ""),
            ("center", "-77.03463077545165,38.90976931970528", "")])),
        ("place.2", _mk_spans([
            ("text", "Dupont Circle", ""), ("geom", box, ""),
            ("center", "-77.04342842102051,38.90963574367117", "")])),
    ]
    cfg = GeocoderConfig(layers={"place": LayerConfig("place", zoom=12)})
    idx = build_acceptance_index(rows, cfg)
    res = reverse_one(idx, -77.0378065109253, 38.909836107628074,
                      split_context=True)
    assert res[0]["place_name"] == "Logan Circle"
    assert res[0]["relevance"] == 1
    # swap index order: the centroid tie-break, not row order, decides
    idx2 = build_acceptance_index(list(reversed(rows)), cfg)
    res2 = reverse_one(idx2, -77.0378065109253, 38.909836107628074,
                       split_context=True)
    assert res2[0]["place_name"] == "Logan Circle"
