"""Fuzzy matching end-to-end — port of
/root/reference/test/acceptance/geocode-unit.fuzzy.test.js.

Simple: 'Pinball Parlour Arcade' (score 100) vs 'Pinball Parlor Arcade'
(score 10): exact text wins at relevance 1 with the fuzzy twin second
at <1; a query matching NEITHER exactly ('parloar') ties both at equal
sub-1 relevance and the higher score wins. fuzzyMatch=false suppresses
the fuzzy twin entirely.

Complex: 'Main St'/'Maine St' addresses in Washington/DC — typo count
ordering, whitespace correction ('100Main St' only matches with fuzzy
on), and the two-error cutoffs ('100Man St', '100 mainst' → nothing).
"""

import pytest

from acceptance_util import _mk_spans, build_acceptance_index, multipoint, point


@pytest.fixture(scope="module")
def simple_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    rows = [
        ("place.1", _mk_spans([
            ("text", "Pinball Parlour Arcade", ""),
            ("geom", point(0.0, 0.0), ""), ("center", "0,0", ""),
            ("score", "100", "")])),
        ("place.2", _mk_spans([
            ("text", "Pinball Parlor Arcade", ""),
            ("geom", point(0.0, 0.0), ""), ("center", "0,0", ""),
            ("score", "10", "")])),
    ]
    cfg = GeocoderConfig(layers={"place": LayerConfig("place", zoom=6)})
    return build_acceptance_index(rows, cfg)


def test_parlor_without_fuzzy(simple_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(simple_index, "pinball parlor arcade", limit=2,
                      autocomplete=False, fuzzy=False, allow_dupes=True)
    assert res[0]["place_name"] == "Pinball Parlor Arcade"
    assert res[0]["feature_id"] == "place.2"
    assert res[0]["relevance"] == 1
    assert len(res) == 1


def test_parlor_with_fuzzy(simple_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(simple_index, "pinball parlor arcade", limit=2,
                      autocomplete=False, fuzzy=True, allow_dupes=True)
    assert res[0]["feature_id"] == "place.2"
    assert res[0]["relevance"] == 1
    assert res[1]["place_name"] == "Pinball Parlour Arcade"
    assert res[1]["feature_id"] == "place.1"
    assert res[1]["relevance"] < 1


def test_parloar_ties_on_relevance_score_breaks(simple_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(simple_index, "pinball parloar arcade", limit=2,
                      autocomplete=False, fuzzy=True, allow_dupes=True)
    assert res[0]["feature_id"] == "place.1"
    assert res[0]["relevance"] < 1
    assert res[1]["feature_id"] == "place.2"
    assert res[1]["relevance"] < 1
    assert res[0]["relevance"] == res[1]["relevance"]


def test_parlor_prefix_without_fuzzy(simple_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(simple_index, "pinball parlor", limit=2,
                      autocomplete=True, fuzzy=False, allow_dupes=True)
    assert res[0]["feature_id"] == "place.2"
    assert res[0]["relevance"] == 1
    assert len(res) == 1


def test_parlor_prefix_with_fuzzy(simple_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(simple_index, "pinball parlor", limit=2,
                      autocomplete=True, fuzzy=True, allow_dupes=True)
    assert res[0]["feature_id"] == "place.2"
    assert res[0]["relevance"] == 1
    assert res[1]["feature_id"] == "place.1"
    assert res[1]["relevance"] < 1


def test_parloar_prefix_with_fuzzy(simple_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(simple_index, "pinball parloar arcade", limit=2,
                      autocomplete=True, fuzzy=True, allow_dupes=True)
    assert res[0]["feature_id"] == "place.1"
    assert res[1]["feature_id"] == "place.2"
    assert res[0]["relevance"] == res[1]["relevance"]
    assert res[0]["relevance"] < 1


@pytest.fixture(scope="module")
def complex_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    from acceptance_util import tile_box, tile_center, tiles_poly

    b = tile_box(6, 32, 32)
    lon, lat = tile_center(6, 32, 32)
    c = f"{lon},{lat}"
    rows = [
        # reference parents are zxy-covered points; PIP context here
        # needs polygon parents (divergence note, acceptance_util)
        ("place.105", _mk_spans([
            ("text", "Washington", ""),
            ("geom", tiles_poly(b), ""), ("center", c, "")])),
        ("address.100", _mk_spans([
            ("text", "Main St", ""),
            ("geom", multipoint((lon, lat)), ""), ("center", c, ""),
            ("addr_numbers", "100", "")])),
        ("address.101", _mk_spans([
            ("text", "Maine St", ""),
            ("geom", multipoint((lon, lat)), ""), ("center", c, ""),
            ("addr_numbers", "100", "")])),
        ("region.110", _mk_spans([
            ("text", "DC", ""),
            ("geom", tiles_poly(b), ""), ("center", c, "")])),
    ]
    cfg = GeocoderConfig(layers={
        "region": LayerConfig("region", zoom=6),
        "place": LayerConfig("place", zoom=6),
        "address": LayerConfig("address", zoom=6, geocoder_address=True,
                               geocoder_name="address"),
    })
    return build_acceptance_index(rows, cfg)


def test_full_address_without_fuzzy(complex_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(complex_index, "100 Main St washington dc", limit=2,
                      autocomplete=True, fuzzy=False, types=["address"])
    assert res[0]["place_name"] == "100 Main St, Washington, DC"
    assert res[0]["feature_id"] == "address.100"
    assert res[0]["relevance"] == 1
    assert len(res) == 1


def test_full_address_with_fuzzy(complex_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(complex_index, "100 Main St washington dc", limit=2,
                      autocomplete=True, fuzzy=True)
    assert res[0]["place_name"] == "100 Main St, Washington, DC"
    assert res[0]["feature_id"] == "address.100"
    assert res[0]["relevance"] == 1
    assert res[1]["place_name"] == "100 Maine St, Washington, DC"
    assert res[1]["feature_id"] == "address.101"
    assert res[1]["relevance"] < 1
    assert len(res) == 2


def test_more_typos_worse_relevance(complex_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(complex_index, "100 Main St warshington dc", limit=2,
                      autocomplete=True, fuzzy=True)
    assert res[0]["feature_id"] == "address.100"
    assert res[0]["relevance"] < 1
    assert res[1]["feature_id"] == "address.101"
    assert res[1]["relevance"] < res[0]["relevance"]
    assert len(res) == 2


def test_joined_number_needs_fuzzy(complex_index):
    """'100Main St': nothing without fuzzy; the whitespace correction
    recovers the address (at <1) with fuzzy on
    (fuzzy.test.js:256-274)."""
    from carmen_ray.geocode.engine import forward_one

    off = forward_one(complex_index, "100Main St washington dc", limit=2,
                      autocomplete=True, fuzzy=False, types=["address"])
    assert off == []
    on = forward_one(complex_index, "100Main St washington dc", limit=2,
                     autocomplete=True, fuzzy=True, types=["address"])
    assert len(on) == 1
    assert on[0]["feature_id"] == "address.100"
    assert on[0]["relevance"] < 1


def test_two_error_classes_return_nothing(complex_index):
    """Whitespace error + spelling error ('100Man St'), or a
    non-numeric whitespace error ('100 mainst'), exceed the fuzzy
    budget (fuzzy.test.js:276-292)."""
    from carmen_ray.geocode.engine import forward_one

    assert forward_one(complex_index, "100Man St washington dc", limit=2,
                       autocomplete=True, fuzzy=True, types=["address"]) == []
    assert forward_one(complex_index, "100 mainst washington dc", limit=2,
                       autocomplete=True, fuzzy=True, types=["address"]) == []
