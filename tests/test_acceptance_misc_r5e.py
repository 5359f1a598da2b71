"""Round-5 tranche 5:

- geocode-unit.konglish.test.js — cross-language query scenarios: a
  Latin query under a ko/ar device locale still finds the right
  features, ranked by score with the language penalty applied evenly.
- geocode-unit.near-alignment.test.js — close-but-no-cigar half
  credit: a query mentioning the NEIGHBORING postcode/place still
  returns the full address first (above the city), below an exactly
  aligned query; and a synonym shared between an aligned region and a
  misaligned place is claimed by the aligned feature.
"""

import json

import pytest

from acceptance_util import _mk_spans, build_acceptance_index, point


def _poly(w, s, e, n):
    return json.dumps({"type": "Polygon", "coordinates": [[
        [w, s], [e, s], [e, n], [w, n], [w, s]]]})


# -------------------------------------------------------------------- konglish

@pytest.fixture(scope="module")
def konglish_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    cfg = GeocoderConfig(layers={
        "place": LayerConfig("place", zoom=6,
                             geocoder_languages=["en", "ko", "ar", "es"]),
        "neighborhood": LayerConfig("neighborhood", zoom=6),
    })
    return build_acceptance_index([
        ("place.1", _mk_spans([
            ("text", "San Francisco", ""),
            ("lang:ar", "مقاطعة سان فرانسيسكو، كاليفورنيا", ""),
            ("lang:en", "San Francisco", ""),
            ("lang:ko", "샌프란시스코", ""),
            ("geom", point(1, 1), ""), ("center", "1,1", ""),
            ("score", "10", "")])),
        ("place.2", _mk_spans([
            ("text", "San Francisco", ""), ("lang:es", "San Francisco", ""),
            ("geom", point(80, -10), ""), ("center", "80,-10", ""),
            ("score", "5", "")])),
        ("place.3", _mk_spans([
            ("text", "San Francisco", ""), ("lang:en", "San Francisco", ""),
            ("geom", point(-80, -10), ""), ("center", "-80,-10", ""),
            ("score", "5", "")])),
        ("neighborhood.3", _mk_spans([
            ("text", "San Francisco", ""),
            ("geom", point(100, -20), ""), ("center", "100,-20", ""),
            ("score", "0", "")])),
    ], cfg)


@pytest.mark.parametrize("lang", [None, "en"])
def test_konglish_sf_ca_first(konglish_index, lang):
    """konglish.test.js:97-111: the score-10 CA feature leads."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(konglish_index, "San Francisco", limit=2,
                      language=lang)
    assert res and res[0]["feature_id"] == "place.1"


@pytest.mark.parametrize("lang", ["ko", "ar"])
def test_konglish_cross_locale(konglish_index, lang):
    """konglish.test.js:113-130: a ko/ar locale penalizes every Latin
    match evenly — ordering stays score-driven (CA, then VE)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(konglish_index, "San Francisco", limit=3,
                      language=lang)
    assert len(res) >= 2
    assert res[0]["feature_id"] == "place.1"
    assert res[1]["feature_id"] == "place.2"


# -------------------------------------------------------------- near-alignment

@pytest.fixture(scope="module")
def alignment_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    # 'post' (a non-builtin name) switches the index numbering to
    # declaration order, reproducing the fixture's region(0) →
    # postcode(1) → place(2) → address(3) hierarchy — carmen numbers
    # by constructor order, and the expected place_name renders the
    # place BEFORE the postcode
    cfg = GeocoderConfig(layers={
        "region": LayerConfig("region", zoom=6),
        "post": LayerConfig("post", zoom=12, geocoder_name="postcode",
                            geocoder_ignore_order=True),
        "place": LayerConfig("place", zoom=12),
        "address": LayerConfig("address", zoom=14, geocoder_address=True),
    })
    return build_acceptance_index([
        ("region.1", _mk_spans([
            ("text", "georgia", ""), ("synonym", "xeorxia", ""),
            ("geom", _poly(-20, -20, 20, 20), ""), ("center", "0,0", ""),
            ("score", "50", "")])),
        ("post.1", _mk_spans([
            ("text", "80138", ""), ("geom", _poly(-6, -6, -4, -4), ""),
            ("center", "-5,-5", ""), ("score", "50", "")])),
        ("post.2", _mk_spans([
            ("text", "80139", ""), ("geom", _poly(-4, -6, -2, -4), ""),
            ("center", "-3,-5", ""), ("score", "50", "")])),
        ("place.1", _mk_spans([
            ("text", "athens", ""), ("synonym", "xeorxia", ""),
            ("geom", _poly(-6, -6, -4, -4), ""), ("center", "-5,-5", ""),
            ("score", "50", "")])),
        ("place.2", _mk_spans([
            ("text", "atlanta", ""), ("geom", _poly(-4, -6, -2, -4), ""),
            ("center", "-3,-5", ""), ("score", "50", "")])),
        ("address.1", _mk_spans([
            ("text", "Main St", ""),
            ("geom", json.dumps({"type": "MultiPoint",
                                 "coordinates": [[-3.99, -5.5]]}), ""),
            ("center", "-3.99,-5.5", ""),
            ("addr_numbers", "100", "")])),
    ], cfg)


def test_alignment_exact(alignment_index):
    """Exactly aligned query → relevance 1, full address first
    (near-alignment.test.js:157-165)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(alignment_index, "100 main st atlanta georgia 80139",
                      limit=10)
    assert res and res[0]["relevance"] == pytest.approx(1.0)
    assert res[0]["place_name"] == "100 Main St, atlanta, 80139, georgia"


def test_alignment_near_miss_half_credit(alignment_index):
    """The neighboring postcode/place get HALF credit: the address
    still leads (above the city) at relevance < 1
    (near-alignment.test.js:167-177)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(alignment_index, "100 main st athens georgia 80138",
                      limit=10)
    assert len(res) >= 2
    assert res[0]["place_name"] == "100 Main St, atlanta, 80139, georgia"
    assert res[0]["relevance"] < 1
    assert res[0]["relevance"] > res[1]["relevance"]


def test_alignment_synonym_claimed_by_aligned(alignment_index):
    """'xeorxia' doubles as the region synonym (aligned) and the
    athens synonym (misaligned) — the aligned claim wins at full
    relevance (near-alignment.test.js:179-192)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(alignment_index, "100 main st xeorxia 80139", limit=1)
    assert res and res[0]["relevance"] == pytest.approx(1.0)
    assert res[0]["place_name"] == "100 Main St, atlanta, 80139, georgia"
