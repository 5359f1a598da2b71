"""Round-5 tranche 3 of acceptance ports:

- geocode-unit.reverse-scoredist.test.js — reverseMode validation, the
  1000 m POI reverse distance tolerance (context.js:390-392,482), and
  reverseMode='score' preferring a higher-scored farther feature from
  a geocoder_reverse_mode source.
- geocode-unit.promote-on-identical-name.test.js — identically-named
  nested features reverse the gappy penalty: the finest feature wins
  by inheriting its parents' scores (geocoder_inherit_score /
  geocoder_grant_score, verifymatch.js:796-825, index.js:209-210).
"""

import pytest

from acceptance_util import (_mk_spans, build_acceptance_index, point,
                             tile_box, tile_center, tiles_poly)

C32 = tile_center(6, 32, 32)
CEN0 = f"{C32[0]},{C32[1]}"
B32 = tiles_poly(tile_box(6, 32, 32))


# ------------------------------------------------------------ reverse-scoredist

@pytest.fixture(scope="module")
def revsd_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    cfg = GeocoderConfig(layers={
        "address": LayerConfig("address", zoom=6, geocoder_type="address",
                               geocoder_name="address"),
        "poi": LayerConfig("poi", zoom=6, geocoder_type="poi",
                           geocoder_name="address",
                           geocoder_reverse_mode=True),
    })
    return build_acceptance_index([
        ("poi.1", _mk_spans([("text", "a", ""), ("geom", point(0, 0), ""),
                             ("center", "0,0", "")])),
        ("poi.2", _mk_spans([("text", "b", ""),
                             ("geom", point(0.1, -0.1), ""),
                             ("center", "0.1,-0.1", "")])),
        ("poi.3", _mk_spans([("text", "c", ""),
                             ("geom", point(1.005, 1.005), ""),
                             ("center", "1.005,1.005", ""),
                             ("score", "10000", "")])),
        ("poi.4", _mk_spans([("text", "d", ""),
                             ("geom", point(1.006, 1.006), ""),
                             ("center", "1.006,1.006", ""),
                             ("score", "10", "")])),
        ("address.1", _mk_spans([("text", "e", ""),
                                 ("geom", point(1.006, 1.006), ""),
                                 ("center", "1.0071,1.0071", ""),
                                 ("score", "1", "")])),
    ], cfg)


def test_reverse_mode_validation(revsd_index):
    """Invalid reverseMode errors with the reference's message."""
    from carmen_ray.geocode.engine import reverse_one

    with pytest.raises(ValueError, match="foo is not a valid reverseMode"):
        reverse_one(revsd_index, 0, 0, reverse_mode="foo")


def test_reverse_distance_threshold_close(revsd_index):
    """Off by .006°/axis from poi.2 → still found (≤1000 m tolerance)."""
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(revsd_index, 0.106, -0.106, limit=1)
    assert len(res) == 1
    assert res[0]["feature_id"] == "poi.2"


def test_reverse_distance_threshold_far(revsd_index):
    """Off by .007°/axis → beyond the 1000 m tolerance, nothing."""
    from carmen_ray.geocode.engine import reverse_one

    assert reverse_one(revsd_index, 0.107, -0.107, limit=1) == []


def test_reverse_mode_score(revsd_index):
    """reverseMode='score': the 10000-score poi.3 beats the closer
    10-score poi.4 for a geocoder_reverse_mode source."""
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(revsd_index, 1.007, 1.007, limit=1,
                      reverse_mode="score")
    assert res and res[0]["feature_id"] == "poi.3"


# --------------------------------------------------- promote-on-identical-name

@pytest.fixture(scope="module")
def ny_promote_index(ray_session):
    import json

    from carmen_ray.config import GeocoderConfig, LayerConfig

    def poly(w, s, e, n):
        return json.dumps({"type": "Polygon", "coordinates": [[
            [w, s], [e, s], [e, n], [w, n], [w, s]]]})

    cfg = GeocoderConfig(layers={
        "country": LayerConfig("country", zoom=6),
        "region": LayerConfig("region", zoom=6),
        "place": LayerConfig("place", zoom=6, geocoder_inherit_score=True),
        "poi": LayerConfig("poi", zoom=14),
    })
    return build_acceptance_index([
        ("country.1", _mk_spans([
            ("text", "usa", ""),
            ("geom", poly(-126.5625, 19.9733, -67.5, 50.2893), ""),
            ("center", "-97,35", ""), ("score", "5", ""),
            ("stack", "us", "")])),
        ("region.2", _mk_spans([
            ("text", "new york", ""), ("synonym", "ny", ""),
            ("geom", poly(-80.9692, 39.876, -71.6308, 45.6601), ""),
            ("center", "-76,42", ""), ("score", "3", ""),
            ("stack", "us", "")])),
        ("place.3", _mk_spans([
            ("text", "new york", ""), ("synonym", "nyc", ""),
            ("geom", poly(-74.0527, 40.7113, -73.881, 40.8377), ""),
            ("center", "-73.96,40.78", ""), ("score", "1", ""),
            ("stack", "us", "")])),
        ("poi.4", _mk_spans([
            ("text", "new york", ""),
            ("geom", point(-73.9666, 40.7811), ""),
            ("center", "-73.9666,40.78115", ""),
            ("stack", "us", "")])),
    ], cfg)


def test_promote_place_over_region(ny_promote_index):
    """'new york usa' → place.3 at relevance 1 (inherited score beats
    the region's own, promote-on-identical-name.test.js:163-169)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(ny_promote_index, "new york usa", limit=1)
    assert res and res[0]["feature_id"] == "place.3"
    assert res[0]["relevance"] == pytest.approx(1.0)


def test_promote_poi_cannot_win(ny_promote_index):
    """With place excluded by types, region.2 wins — the unscored POI
    never does (promote-on-identical-name.test.js:171-177)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(ny_promote_index, "new york usa", limit=1,
                      types=["poi", "region", "country"])
    assert res and res[0]["feature_id"] == "region.2"
    assert res[0]["relevance"] == pytest.approx(1.0)


def test_promote_inherit_chain(ray_session):
    """Nonthaburi ×3 (region/district/place all inherit+grant): the
    finest (place) leads (promote-on-identical-name.test.js:280-285)."""
    import json

    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import forward_one

    def poly(w, s, e, n):
        return json.dumps({"type": "Polygon", "coordinates": [[
            [w, s], [e, s], [e, n], [w, n], [w, s]]]})

    cfg = GeocoderConfig(layers={
        "country": LayerConfig("country", zoom=6),
        "region": LayerConfig("region", zoom=6,
                              geocoder_inherit_score=True,
                              geocoder_grant_score=True),
        "district": LayerConfig("district", zoom=6,
                                geocoder_inherit_score=True,
                                geocoder_grant_score=True),
        "place": LayerConfig("place", zoom=6, geocoder_inherit_score=True),
    })
    nb = poly(100.4957, 13.8437, 100.5297, 13.8787)
    rows = [("country.10", _mk_spans([
        ("text", "Thailand", ""),
        ("geom", poly(99.9097, 13.3255, 101.1237, 14.3815), ""),
        ("center", "100.5,13.85", ""), ("score", "10", ""),
        ("stack", "th", "")]))]
    for i, layer in enumerate(["region", "district", "place"]):
        rows.append((f"{layer}.{i + 1}", _mk_spans([
            ("text", "Nonthaburi", ""), ("geom", nb, ""),
            ("center", "100.51,13.86", ""), ("score", str(5 - i), ""),
            ("stack", "th", "")])))
    ix = build_acceptance_index(rows, cfg)
    res = forward_one(ix, "nonthaburi", limit=1)
    assert res and res[0]["feature_id"].startswith("place.")


def test_promote_grant_score_false(ray_session):
    """Mexico: country opts OUT of granting (geocoder_grant_score:
    false) so the identically-named place chain cannot inherit its 20
    and the country leads (promote-on-identical-name.test.js:292-398)."""
    import json

    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import forward_one

    def poly(w, s, e, n):
        return json.dumps({"type": "Polygon", "coordinates": [[
            [w, s], [e, s], [e, n], [w, n], [w, s]]]})

    cfg = GeocoderConfig(layers={
        "country": LayerConfig("country", zoom=6,
                               geocoder_languages=["en", "fr"],
                               geocoder_grant_score=False),
        "region": LayerConfig("region", zoom=6,
                              geocoder_languages=["en", "fr"]),
        "district": LayerConfig("district", zoom=6,
                                geocoder_languages=["en", "fr"]),
        "place": LayerConfig("place", zoom=6,
                             geocoder_languages=["en", "fr"],
                             geocoder_inherit_score=True),
    })
    mc = poly(100.4957, 13.8437, 100.5297, 13.8787)
    rows = [("country.10", _mk_spans([
        ("text", "Mexico", ""), ("lang:fr", "Mexico", ""),
        ("geom", poly(99.9097, 13.3255, 101.1237, 14.3815), ""),
        ("center", "100.5,13.85", ""), ("score", "20", ""),
        ("stack", "mx", "")]))]
    for i, layer in enumerate(["place", "district", "region"]):
        rows.append((f"{layer}.{i + 1}", _mk_spans([
            ("text", "Mexico City", ""), ("lang:fr", "Mexico", ""),
            ("geom", mc, ""), ("center", "100.51,13.86", ""),
            ("score", str(5 - i), ""), ("stack", "mx", "")])))
    ix = build_acceptance_index(rows, cfg)
    res = forward_one(ix, "mexico", limit=1)
    assert res and res[0]["feature_id"].startswith("country.")
