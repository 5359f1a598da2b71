"""Round-5 tranche of small acceptance ports (one behavior each):

- geocode-unit.bmask.test.js — non_overlapping_indexes from
  geocoder_stack disjointness (index.js:325-342).
- geocode-unit.dataterm-only.test.js — a feature whose text is only
  a dataterm placeholder ('-') is not matched by its address number.
- geocode-unit.unicode-replace.test.js — token-map LHS casts a wide
  (diacritic-stripped) net, and the unambiguous inverse applies.
- geocode-unit.emoji-bomb.test.js — a 20-emoji query returns nothing
  and is rejected fast (no fuzzy explosion).
- geocode-unit.named.test.js — two sources sharing geocoder_name
  'place' render ids in the shared namespace.
- geocode-unit.numeric-address.test.js — numeric street autocomplete:
  '100 17th' / '100 17t' / '100 17' all find '100 17th st'.
- geocode-unit.index-limit.test.js — 128 configured indexes work,
  forward and reverse.
- geocode-unit.dataterm-vs-postcode.test.js — '2000 Austria' prefers
  the postcode feature over 19 address clusters holding 2000.
- geocode-unit.scorefactor.test.js — cross-index score comparability:
  a 1e6-score country beats 40 10-score places on the same name
  (scores normalize against the geocoder-wide bound, not per-index).
- geocode-unit.io-autocomplete.test.js (behavioral half) — 'aa' over
  99 aa-prefixed names returns the default limit of 5. (The IO-dedup
  shard-load accounting half is carmen-core storage-internal.)

Not ported, by decision: geocode-unit.invalid-tokens.test.js (the
throw originates in out-of-repo carmen-core native code,
loadWordReplacements — no JS-visible semantics to pin) and
geocode-unit.multiload.test.js (pins JS instance-cache identity
across Carmen clones, a storage-runtime concern with no analogue
here).
"""

import random
import time

import pytest

from acceptance_util import (_mk_spans, build_acceptance_index, multipoint,
                             point, tile_box, tile_center, tiles_poly)

C32 = tile_center(6, 32, 32)
PT0 = point(*C32)
CEN0 = f"{C32[0]},{C32[1]}"
B32 = tiles_poly(tile_box(6, 32, 32))
C33 = tile_center(6, 33, 32)
CEN33 = f"{C33[0]},{C33[1]}"
B33 = tiles_poly(tile_box(6, 33, 32))


def test_bmask_non_overlapping_indexes(ray_session):
    """geocode-unit.bmask.test.js: small(west+east) overlaps both;
    west and east are mutually non-overlapping."""
    from carmen_ray.config import GeocoderConfig, LayerConfig

    cfg = GeocoderConfig(layers={
        "small": LayerConfig("small", zoom=6, geocoder_stack=["west", "east"]),
        "west": LayerConfig("west", zoom=6, geocoder_stack=["west"]),
        "east": LayerConfig("east", zoom=6, geocoder_stack=["east"]),
    })
    ix = build_acceptance_index([
        ("small.1", _mk_spans([("text", "smalltown", ""), ("geom", PT0, ""),
                               ("center", CEN0, "")])),
        ("west.1", _mk_spans([("text", "westtown", ""), ("geom", PT0, ""),
                              ("center", CEN0, "")])),
        ("east.1", _mk_spans([("text", "easttown", ""), ("geom", PT0, ""),
                              ("center", CEN0, "")])),
    ], cfg)
    l2i = {str(l): int(i) for l, i in zip(ix._f["layer"], ix._f["idx"])}
    assert ix.non_overlap.get(l2i["small"], frozenset()) == frozenset()
    assert ix.non_overlap[l2i["west"]] == frozenset({l2i["east"]})
    assert ix.non_overlap[l2i["east"]] == frozenset({l2i["west"]})


def test_dataterm_only_not_searchable(ray_session):
    """geocode-unit.dataterm-only.test.js: carmen:text '-' with
    addressnumber ['100'] — querying '100' finds nothing."""
    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import forward_one

    cfg = GeocoderConfig(layers={
        "address": LayerConfig("address", zoom=6, geocoder_address=True)})
    ix = build_acceptance_index([
        ("address.100", _mk_spans([
            ("text", "-", ""), ("geom", multipoint((0, 0)), ""),
            ("center", "0,0", ""), ("addr_numbers", "100", "")])),
    ], cfg)
    assert forward_one(ix, "100", limit=1) == []


def test_unicode_replace_wide_net(ray_session):
    """geocode-unit.unicode-replace.test.js: 'Maréchal'→'Mal' also
    binds the unidecoded 'Marechal', and 'Mal' resolves back."""
    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import forward_one

    cfg = GeocoderConfig(tokens={"Maréchal": "Mal"},
                         layers={"test": LayerConfig("test", zoom=6)})
    ix = build_acceptance_index([
        ("test.1", _mk_spans([("text", "Maréchal", ""), ("geom", PT0, ""),
                              ("center", CEN0, "")])),
    ], cfg)
    for q in ["Mal", "Maréchal", "Marechal"]:
        res = forward_one(ix, q, limit=1)
        assert res and res[0]["place_name"] == "Maréchal", q


def test_emoji_bomb_rejected_fast(ray_session):
    """geocode-unit.emoji-bomb.test.js: a 20-emoji query returns no
    features and doesn't blow up the fuzzy/permutation machinery."""
    from carmen_ray.geocode.engine import forward_one

    ix = build_acceptance_index([
        ("place.1", _mk_spans([("text", "placey place", ""),
                               ("geom", PT0, ""), ("center", CEN0, "")])),
    ])
    t0 = time.monotonic()
    res = forward_one(ix, " ".join(["😂"] * 20))
    assert res == []
    # reference pins <100 ms; allow slack for CI hosts, the regression
    # guarded against is combinatorial (seconds-to-minutes)
    assert time.monotonic() - t0 < 1.0


def test_named_shared_namespace(ray_session):
    """geocode-unit.named.test.js: geocoder_name 'place' shared by two
    sources renders ids place.1 / place.2."""
    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import forward_one

    cfg = GeocoderConfig(layers={
        "place_a": LayerConfig("place_a", zoom=6, geocoder_name="place"),
        "place_b": LayerConfig("place_b", zoom=6, geocoder_name="place"),
    })
    ix = build_acceptance_index([
        ("place_a.1", _mk_spans([("text", "sadtown", ""), ("geom", PT0, ""),
                                 ("center", CEN0, "")])),
        ("place_b.2", _mk_spans([("text", "funtown", ""), ("geom", PT0, ""),
                                 ("center", CEN0, "")])),
    ], cfg)
    for q, fid, name in [("sadtown", "place.1", "sadtown"),
                         ("funtown", "place.2", "funtown")]:
        res = forward_one(ix, q, limit=1)
        assert res[0]["feature_id"] == fid
        assert res[0]["place_name"] == name


@pytest.fixture(scope="module")
def numeric_address_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    cfg = GeocoderConfig(layers={
        "address": LayerConfig("address", zoom=6, geocoder_address=True)})
    return build_acceptance_index([
        ("address.100", _mk_spans([
            ("text", "17th st", ""), ("geom", multipoint((0, 0)), ""),
            ("center", "0,0", ""), ("addr_numbers", "100", "")])),
    ], cfg)


@pytest.mark.parametrize("q", ["100 17th", "100 17t", "100 17"])
def test_numeric_address_autocomplete(numeric_address_index, q):
    """geocode-unit.numeric-address.test.js: numeric street names
    autocomplete under a leading house number."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(numeric_address_index, q, limit=1)
    assert len(res) == 1
    assert res[0]["place_name"].startswith("100 17th st")


def test_index_limit_128_sources(ray_session):
    """geocode-unit.index-limit.test.js: 128 configured indexes (127
    sharing geocoder_name 'country' + place) forward and reverse."""
    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import forward_one, reverse_one

    layers = {f"country{i}": LayerConfig(f"country{i}", zoom=6,
                                         geocoder_name="country")
              for i in range(127)}
    layers["place"] = LayerConfig("place", zoom=6, geocoder_name="place")
    rows = [("place.1", _mk_spans([("text", "Chicago", ""), ("geom", B32, ""),
                                   ("center", CEN0, "")]))]
    rows += [(f"country{i}.1", _mk_spans([
        ("text", "USA", ""), ("geom", B32, ""), ("center", CEN0, "")]))
        for i in range(127)]
    ix = build_acceptance_index(rows, GeocoderConfig(layers=layers))
    res = forward_one(ix, "Chicago", limit=1)
    assert res[0]["place_name"] == "Chicago, USA"
    assert res[0]["relevance"] == 1.0
    res = reverse_one(ix, C32[0], C32[1], limit=1)
    assert res[0]["place_name"] == "Chicago, USA"
    assert res[0]["relevance"] == 1.0


def test_dataterm_vs_postcode(ray_session):
    """geocode-unit.dataterm-vs-postcode.test.js: '2000 Austria'
    returns the postcode feature, not an address cluster whose
    dataterm holds 2000."""
    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import forward_one

    cfg = GeocoderConfig(layers={
        "country": LayerConfig("country", zoom=6),
        "postcode": LayerConfig("postcode", zoom=6),
        "address": LayerConfig("address", zoom=6, geocoder_address=True),
    })
    rows = [(f"address.{i}", _mk_spans([
        ("text", "Austria St", ""), ("geom", multipoint((i, 0)), ""),
        ("center", f"{i},0", ""), ("addr_numbers", "2000", "")]))
        for i in range(1, 20)]
    rows.append(("country.1", _mk_spans([
        ("text", "Austria", ""), ("geom", B33, ""), ("center", CEN33, "")])))
    rows.append(("postcode.1", _mk_spans([
        ("text", "2000", ""), ("geom", B33, ""), ("center", CEN33, "")])))
    ix = build_acceptance_index(rows, cfg)
    res = forward_one(ix, "2000 Austria", limit=5)
    assert res[0]["feature_id"] == "postcode.1"


def test_scorefactor_cross_index(ray_session):
    """geocode-unit.scorefactor.test.js: scores compare across indexes
    after normalization — country.2 (1e6) beats 40 place features
    (score 10) named 'testplace' even with a 1e9 sibling present."""
    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import forward_one

    cfg = GeocoderConfig(layers={
        "country": LayerConfig("country", zoom=6),
        "place": LayerConfig("place", zoom=6),
    })
    rows = [(f"place.{i}", _mk_spans([
        ("text", "testplace", ""), ("geom", B32, ""), ("center", CEN0, ""),
        ("score", "10", "")])) for i in range(1, 41)]
    rows.append(("country.1", _mk_spans([
        ("text", "ignoreme", ""), ("geom", B32, ""), ("center", CEN0, ""),
        ("score", "1000000000", "")])))
    rows.append(("country.2", _mk_spans([
        ("text", "testplace", ""), ("geom", B33, ""), ("center", CEN33, ""),
        ("score", "1000000", "")])))
    ix = build_acceptance_index(rows, cfg)
    res = forward_one(ix, "testplace", limit=1)
    assert res[0]["feature_id"] == "country.2"
    assert res[0]["place_name"] == "testplace"


def test_io_autocomplete_default_limit(ray_session):
    """geocode-unit.io-autocomplete.test.js (behavioral half): 'aa'
    over 99 aa-prefixed names returns the default 5 features."""
    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import forward_one

    rnd = random.Random(7)
    names: set[str] = set()
    while len(names) < 99:
        names.add("aa" + "".join(
            rnd.choice("abcdefghijklmnopqrstuvwxyz0123456789")
            for _ in range(8)))
    rows = [(f"place.{i + 1}", _mk_spans([
        ("text", n, ""), ("geom", B32, ""), ("center", CEN0, "")]))
        for i, n in enumerate(sorted(names))]
    ix = build_acceptance_index(
        rows, GeocoderConfig(
            layers={"place": LayerConfig("place", zoom=6)}))
    assert len(forward_one(ix, "aa")) == 5
