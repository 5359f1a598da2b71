"""Round-5 tranche 21:
geocode-unit.fuzzy-with-tokens-and-autocomplete.js — the interaction
matrix of token replacement × fuzzy correction × autocomplete: a
replaced final word still autocompletes, a misspelling fuzzy-corrects
INTO the replacement, 'fo'/'fort'/'ft' prefixes resolve through the
Fort↔Ft token pair, autocomplete=False kills the prefixes, and fuzzy
matching revives near-misses ('forte', 'forp') without swallowing
longer words ('forten')."""

import pytest

from acceptance_util import (_mk_spans, build_acceptance_index, tile_box,
                             tile_center, tiles_poly)

C32 = tile_center(6, 32, 32)
CEN0 = f"{C32[0]},{C32[1]}"
B32 = tiles_poly(tile_box(6, 32, 32))


@pytest.fixture(scope="module")
def fort_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    cfg = GeocoderConfig(layers={
        "poi": LayerConfig("poi", zoom=6,
                           geocoder_tokens={"Street": "St",
                                            "Station": "Stn",
                                            "Fort": "Ft"})})
    names = ["30th Street Station", "Fort Wayne Stadium",
             "Ft Sumpter Museum", "Fortenberry Coffee"]
    return build_acceptance_index([
        (f"poi.{i + 1}", _mk_spans([
            ("text", n, ""), ("geom", B32, ""), ("center", CEN0, ""),
            ("score", "100", "")]))
        for i, n in enumerate(names)
    ], cfg)


def _names(index, q, **kw):
    from carmen_ray.geocode.engine import forward_one

    return sorted(r["place_name"] for r in forward_one(index, q, limit=5,
                                                       **kw))


def test_replaced_tokens_autocomplete(fort_index):
    """'30th st' / '30th stre' → the station at relevance 1
    (fuzzy-with-tokens:69-130)."""
    from carmen_ray.geocode.engine import forward_one

    for q in ["30th st", "30th stre"]:
        res = forward_one(fort_index, q, limit=5)
        assert len(res) == 1, q
        assert res[0]["place_name"] == "30th Street Station"
        assert res[0]["relevance"] == pytest.approx(1.0)


def test_fuzzy_then_replacement_then_autocomplete(fort_index):
    """'30th strete' fuzzy-corrects, replaces, autocompletes —
    relevance < 1 (fuzzy-with-tokens:111-120)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(fort_index, "30th strete", limit=5)
    assert len(res) == 1
    assert res[0]["place_name"] == "30th Street Station"
    assert res[0]["relevance"] < 1


@pytest.mark.parametrize("q,expected", [
    ("fo", ["Fort Wayne Stadium", "Fortenberry Coffee",
            "Ft Sumpter Museum"]),
    ("fort", ["Fort Wayne Stadium", "Fortenberry Coffee",
              "Ft Sumpter Museum"]),
    ("ft", ["Fort Wayne Stadium", "Ft Sumpter Museum"]),
])
def test_fort_prefixes(fort_index, q, expected):
    """fuzzy-with-tokens:135-165."""
    assert _names(fort_index, q) == expected


@pytest.mark.parametrize("q", ["fo", "fort"])
def test_no_autocomplete_no_prefix(fort_index, q):
    """fuzzy-with-tokens:167-187."""
    assert _names(fort_index, q, autocomplete=False) == []


@pytest.mark.parametrize("q,expected", [
    ("forte", ["Fort Wayne Stadium", "Fortenberry Coffee",
               "Ft Sumpter Museum"]),
    ("forp", ["Fort Wayne Stadium", "Ft Sumpter Museum"]),
    ("forten", ["Fortenberry Coffee"]),
])
def test_fuzzy_revives_near_misses(fort_index, q, expected):
    """fuzzy-with-tokens:189-225."""
    assert _names(fort_index, q, fuzzy=True) == expected
