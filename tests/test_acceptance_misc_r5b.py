"""Round-5 tranche 2 of acceptance ports (one behavior each):

- geocode-unit.reverse-only.test.js — carmen:reverse_only features are
  indexed but never become forward results (verifymatch.js:472); they
  still serve context stacking.
- geocode-unit.scoresort.test.js — cross-index scoredist ordering on an
  autocomplete prefix over five indexes with very different max scores.
- geocode-unit.unidecollide.test.js — unidecode/char-set separation:
  'aruba' must not hit a Japanese synonym, and mid-word prefixes
  ('yz' in 'xyz') never match.
- geocode-unit.numeric.test.js — numeric text autocompletes like any
  other term; a bare number query does not fall into address
  interpolation when postcode features exist.
- geocode-unit.address-numnum.test.js — a housenumber can only be
  interpolated when a DISTINCT query token supplies it ('115 115'
  works, but '115 37' must prefer the '115 37' postcode and
  interpolate 37 onto street '115', not 115 onto itself).
- geocode-unit.proximity-polygon.test.js — proximity distance is the
  distance to the closest covered cell of a polygon feature, not to
  its (possibly far) center.
"""

import pytest

from acceptance_util import (_mk_spans, build_acceptance_index, multipoint,
                             point, tile_box, tile_center, tiles_poly)

C32 = tile_center(6, 32, 32)
CEN0 = f"{C32[0]},{C32[1]}"
PT0 = point(*C32)
B32 = tiles_poly(tile_box(6, 32, 32))


# ---------------------------------------------------------------- reverse-only

@pytest.fixture(scope="module")
def reverse_only_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    cfg = GeocoderConfig(layers={
        "country": LayerConfig("country", zoom=6),
        "place": LayerConfig("place", zoom=6),
        "address": LayerConfig("address", zoom=6),
    })
    return build_acceptance_index([
        ("country.1", _mk_spans([("text", "america", ""), ("geom", B32, ""),
                                 ("center", CEN0, "")])),
        ("place.3", _mk_spans([("text", "some place", ""), ("geom", B32, ""),
                               ("center", CEN0, ""),
                               ("reverse_only", "true", "")])),
        ("address.1", _mk_spans([("text", "fake street", ""),
                                 ("geom", multipoint(C32, C32, C32), ""),
                                 ("center", CEN0, "")])),
    ], cfg)


def test_reverse_only_not_forward(reverse_only_index):
    """'some place' alone returns nothing (verifymatch.js:472)."""
    from carmen_ray.geocode.engine import forward_one

    assert forward_one(reverse_only_index, "some place", limit=1) == []


def test_reverse_only_same_text_falls_back(reverse_only_index):
    """'some place, america' falls back to the country feature."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(reverse_only_index, "some place, america", limit=1)
    assert res and res[0]["feature_id"] == "country.1"
    assert res[0]["place_name"] == "america"


def test_reverse_only_still_serves_context(reverse_only_index):
    """'fake street, some place' returns the address WITH the
    reverse_only place in its context chain."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(reverse_only_index, "fake street, some place", limit=5)
    assert res and res[0]["feature_id"] == "address.1"
    assert res[0]["place_name"] == "fake street, some place, america"


def test_reverse_only_reverse_still_finds(reverse_only_index):
    """A reverse query at the shared center still returns the place
    (the flag only suppresses FORWARD results)."""
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(reverse_only_index, C32[0], C32[1], limit=1,
                      types=["place"])
    assert res and res[0]["feature_id"] == "place.3"


# ------------------------------------------------------------------ scoresort

def test_scoresort_cross_index_ordering(ray_session):
    """geocode-unit.scoresort.test.js: an autocomplete prefix over five
    indexes ranks by globally normalized scoredist — lamplace.1 (36500)
    first, namplace.1 (16000) second, despite region's 160000 bigtown
    setting the global bound and region holding dozens of candidates."""
    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import forward_one

    cfg = GeocoderConfig(layers={
        l: LayerConfig(l, zoom=6)
        for l in ("region", "place", "lamplace", "namplace", "locality")})
    rows = [("region.1", _mk_spans([
        ("text", "bigtown", ""), ("geom", B32, ""), ("center", CEN0, ""),
        ("score", "160000", "")]))]
    for i in range(2, 25):
        rows.append((f"region.{i}", _mk_spans([
            ("text", f"smallville{i}", ""), ("geom", B32, ""),
            ("center", CEN0, ""), ("score", "1", "")])))
    for i in range(25, 50):
        rows.append((f"region.{i}", _mk_spans([
            ("text", f"smallville{i}", ""), ("geom", B32, ""),
            ("center", CEN0, ""), ("score", "3000", "")])))
    rows.append(("place.1", _mk_spans([
        ("text", "smallville1", ""), ("geom", B32, ""), ("center", CEN0, ""),
        ("score", "10000", "")])))
    rows.append(("lamplace.1", _mk_spans([
        ("text", "smallville1", ""), ("geom", B32, ""), ("center", CEN0, ""),
        ("score", "36500", "")])))
    for i in range(2, 25):
        rows.append((f"lamplace.{i}", _mk_spans([
            ("text", f"smallville{i}", ""), ("geom", B32, ""),
            ("center", CEN0, ""), ("score", "6000", "")])))
    rows.append(("namplace.1", _mk_spans([
        ("text", "smallville1", ""), ("geom", B32, ""), ("center", CEN0, ""),
        ("score", "16000", "")])))
    rows.append(("locality.1", _mk_spans([
        ("text", "smallville1", ""), ("geom", B32, ""), ("center", CEN0, ""),
        ("score", "1000", "")])))
    ix = build_acceptance_index(rows, cfg)
    res = forward_one(ix, "smallville", limit=5)
    assert res[0]["feature_id"] == "lamplace.1"
    assert res[1]["feature_id"] == "namplace.1"


# --------------------------------------------------------------- unidecollide

def test_unidecollide_no_cross_charset_hit(ray_session):
    """'aruba' never matches a feature whose Japanese synonym
    unidecodes to 'arubataZhou'; the JP text and a Latin prefix do."""
    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import forward_one

    cfg = GeocoderConfig(layers={
        "region": LayerConfig("region", zoom=6,
                              geocoder_languages=["ja"])})
    ix = build_acceptance_index([
        ("region.1", _mk_spans([("text", "Alberta", ""),
                                ("lang:ja", "アルバータ州", ""),
                                ("geom", B32, ""), ("center", CEN0, "")])),
    ], cfg)
    assert forward_one(ix, "aruba", limit=1) == []
    res = forward_one(ix, "アルバータ州", limit=1)
    assert res and res[0]["place_name"] == "Alberta"
    assert res[0]["feature_id"] == "region.1"
    res = forward_one(ix, "Alber", limit=1)
    assert res and res[0]["place_name"] == "Alberta"


def test_unidecollide_midword_prefix_never_matches(ray_session):
    """'yz' / 'a yz' never match 'abc Xyz' — prefixes bind to word
    starts only."""
    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import forward_one

    cfg = GeocoderConfig(layers={"region": LayerConfig("region", zoom=6)})
    ix = build_acceptance_index([
        ("region.1", _mk_spans([("text", "abc Xyz", ""), ("geom", B32, ""),
                                ("center", CEN0, "")])),
    ], cfg)
    assert forward_one(ix, "yz", limit=1) == []
    assert forward_one(ix, "a yz", limit=1) == []


# -------------------------------------------------------------------- numeric

@pytest.fixture(scope="module")
def numeric_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    cfg = GeocoderConfig(layers={
        "postcode": LayerConfig("postcode", zoom=6),
        "address": LayerConfig("address", zoom=6, geocoder_address=True),
    })
    return build_acceptance_index([
        ("postcode.1", _mk_spans([("text", "22209", ""), ("geom", B32, ""),
                                  ("center", CEN0, "")])),
        ("postcode.2", _mk_spans([("text", "22209 restaurant", ""),
                                  ("geom", B32, ""), ("center", CEN0, "")])),
        ("address.2", _mk_spans([("text", "main st", ""),
                                 ("geom", multipoint(C32), ""),
                                 ("center", CEN0, ""),
                                 ("score", "1000", ""),
                                 ("addr_numbers", "22209", "")])),
    ], cfg)


def test_numeric_full_query(numeric_index):
    """'22209' finds both postcode features at relevance 1.00
    (numeric.test.js:66-73). Documented divergence: the reference
    orders the two-word autocomplete first (its own comment flags the
    pair as a suggest-vs-final-mode artifact of carmen-core's grid
    iteration); this engine's deterministic tail orders the exact
    match first. Both carry identical relevance/scoredist, and the
    reference's duplicate-address fixture pins the OPPOSITE (id-
    ascending) order at the same tie, so the set + relevance is the
    portable contract."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(numeric_index, "22209", limit=2)
    names = [r["place_name"] for r in res]
    assert sorted(names) == ["22209", "22209 restaurant"]
    assert res[0]["relevance"] == pytest.approx(1.00)
    assert res[1]["relevance"] == pytest.approx(1.00)


def test_numeric_degen(numeric_index):
    """'222' autocompletes numeric terms too (numeric.test.js:77-82)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(numeric_index, "222", limit=1)
    assert len(res) == 1


def test_numeric_nonnumeric_degen(numeric_index):
    """'22209 rest' → '22209 restaurant' (numeric.test.js:85-90)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(numeric_index, "22209 rest", limit=2)
    assert res and res[0]["place_name"] == "22209 restaurant"


# ------------------------------------------------------------- address-numnum

@pytest.fixture(scope="module")
def numnum_index(ray_session):
    import json

    from carmen_ray.config import GeocoderConfig, LayerConfig

    cfg = GeocoderConfig(layers={
        "country": LayerConfig("country", zoom=6),
        "postcode": LayerConfig("postcode", zoom=6),
        "address": LayerConfig("address", zoom=6, geocoder_address=True),
    })
    street = json.dumps({"type": "LineString",
                         "coordinates": [[0, 0], [0, 0.5]]})
    sweden = json.dumps({"type": "Polygon", "coordinates": [[
        [-1, -1], [-1, 1], [1, 1], [1, -1], [-1, -1]]]})
    return build_acceptance_index([
        ("address.1", _mk_spans([
            ("text", "115", ""), ("geom", street, ""), ("center", "0,0", ""),
            ("addr_range", json.dumps({"lfromhn": [["0"]],
                                       "ltohn": [["200"]]}), "")])),
        ("postcode.3", _mk_spans([("text", "115 37", ""),
                                  ("geom", point(-0.5, -0.5), ""),
                                  ("center", "-0.5,-0.5", "")])),
        ("country.2", _mk_spans([("text", "Sweden", ""), ("geom", sweden, ""),
                                 ("center", "0,0", "")])),
    ], cfg)


def test_numnum_postcode_beats_self_interpolation(numnum_index):
    """'115 37 Sweden' → the '115 37' postcode first, then 37
    interpolated onto street '115' (maskAddress must not reuse the
    street token as its own housenumber)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(numnum_index, "115 37 Sweden", limit=2)
    assert res and res[0]["place_name"] == "115 37, Sweden"
    assert res[0]["feature_id"].startswith("postcode.")
    assert res[1]["place_name"] == "37 115, Sweden"
    assert res[1]["feature_id"].startswith("address.")


def test_numnum_repeated_number_interpolates(numnum_index):
    """'115 115 Sweden' → address '115 115, Sweden' (a SECOND 115
    token supplies the housenumber)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(numnum_index, "115 115 Sweden", limit=1)
    assert res and res[0]["place_name"] == "115 115, Sweden"
    assert res[0]["feature_id"].startswith("address.")


# ---------------------------------------------------------- proximity-polygon

def test_proximity_polygon_distance_to_cover(ray_session):
    """geocode-unit.proximity-polygon.test.js: three same-center
    features covering three disjoint z12 tile bands; proximity (3,-3)
    ranks by distance to the CLOSEST COVERED CELL — san diego (band 2)
    first, san jose, then san francisco — so the lower-scored but
    closer-by-cover feature wins."""
    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import forward_one

    tiles = [(12, k, l) for k in range(2048, 2080)
             for l in range(2048, 2080)]
    bands = [tiles[:341], tiles[341:682], tiles[682:]]
    cfg = GeocoderConfig(layers={
        "place": LayerConfig("place", zoom=12, maxscore=1670000)})
    rows = []
    for fid, (name, score, band) in enumerate([
            ("san francisco", 8033, bands[0]),
            ("san diego", 7891, bands[1]),
            ("san jose", 3877, bands[2])], start=1):
        rows.append((f"place.{fid}", _mk_spans([
            ("text", name, ""),
            ("geom", tiles_poly(*[tile_box(*t) for t in band]), ""),
            ("center", "2,-1", ""), ("score", str(score), "")])))
    ix = build_acceptance_index(rows, cfg)
    res = forward_one(ix, "san", proximity=(3, -3), limit=3)
    assert [r["feature_id"] for r in res] == ["place.2", "place.3", "place.1"]
    assert res[0]["score"] < res[2]["score"]
    assert res[0]["scoredist"] > res[2]["scoredist"]
