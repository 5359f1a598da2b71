"""Round-5 tranche 23: geocode-unit.address-format.test.js —
SOURCE-level geocoder_format / geocoder_format_{lang} templates:
German number-after-name rendering, language selection with fallback
to the default template, and a full multi-layer format stack where
each layer's own template renders its results."""

import json

import pytest

from acceptance_util import (_mk_spans, build_acceptance_index, multipoint,
                             tile_box, tile_center, tiles_poly)

C32 = tile_center(6, 32, 32)
CEN0 = f"{C32[0]},{C32[1]}"
B32 = tiles_poly(tile_box(6, 32, 32))
_DE = ("{{address.name}} {{address.number}} {{place.name}}, "
       "{{region.name}} {{postcode.name}}, {{country.name}}")
_US = ("{{address.number}} {{address.name}} {{place.name}}, "
       "{{region.name}} {{postcode.name}}, {{country.name}}")


def test_german_source_format(ray_session):
    """address-format.test.js:14-50: number renders AFTER the street
    for both query orders."""
    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import forward_one

    cfg = GeocoderConfig(layers={
        "address": LayerConfig("address", zoom=6, geocoder_address=True,
                               geocoder_format=_DE)})
    ix = build_acceptance_index([
        ("address.1", _mk_spans([
            ("text", "fake street", ""),
            ("geom", multipoint(C32, C32, C32), ""), ("center", CEN0, ""),
            ("addr_numbers", "9,10,7", "")])),
    ], cfg)
    for q in ["fake street 9", "9 fake street"]:
        res = forward_one(ix, q, limit=1)
        assert res and res[0]["place_name"] == "fake street 9", q


@pytest.mark.parametrize("lang,expected", [
    (None, "9 fake street"),
    ("en", "9 fake street"),        # no en template → default
    ("zh", "9 fake street"),        # bad/unknown code → default
])
def test_language_format_fallback(ray_session, lang, expected):
    """address-format.test.js:56-114: format_de exists but non-de
    requests fall back to the default template."""
    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import forward_one

    cfg = GeocoderConfig(layers={
        "address": LayerConfig("address", zoom=6, geocoder_address=True,
                               geocoder_format=_US,
                               geocoder_formats={"de": _DE})})
    ix = build_acceptance_index([
        ("address.1", _mk_spans([
            ("text", "fake street", ""),
            ("geom", multipoint(C32, C32, C32), ""), ("center", CEN0, ""),
            ("addr_numbers", "9,10,7", "")])),
    ], cfg)
    res = forward_one(ix, "9 fake street", limit=1, language=lang)
    assert res and res[0]["place_name"] == expected


@pytest.fixture(scope="module")
def springfield_index(ray_session):
    """The multi-layer format stack (address-format.test.js:122-230)."""
    from carmen_ray.config import GeocoderConfig, LayerConfig

    def shrink(box, f):
        w, s, e, n = box
        cx, cy = (w + e) / 2, (s + n) / 2
        return (cx - (cx - w) * f, cy - (cy - s) * f,
                cx + (e - cx) * f, cy + (n - cy) * f)

    b = tile_box(6, 32, 32)
    cfg = GeocoderConfig(layers={
        "country": LayerConfig("country", zoom=6,
                               geocoder_format="{{country.name}}"),
        "region": LayerConfig(
            "region", zoom=6,
            geocoder_format="{{region.name}}, {{country.name}}"),
        "postcode": LayerConfig(
            "postcode", zoom=6,
            geocoder_format="{{region.name}}, {{postcode.name}}, "
                            "{{country.name}}"),
        "place": LayerConfig(
            "place", zoom=6,
            geocoder_format="{{place.name}}, {{region.name}} "
                            "{{postcode.name}}, {{country.name}}"),
        "address": LayerConfig("address", zoom=6, geocoder_address=True,
                               geocoder_format=_US),
        "poi": LayerConfig(
            "poi", zoom=6,
            geocoder_format="{{poi.name}}, {{address.number}} "
                            "{{address.name}} {{place.name}}, "
                            "{{region.name}} {{postcode.name}}, "
                            "{{country.name}}"),
    })
    ctr = tile_center(6, 32, 32)
    # the address carries a polygon member alongside its cluster so the
    # POI's PIP context includes it (the reference's context is
    # tile-based; acceptance_util docstring documents the convention)
    addr_geom = json.dumps({"type": "GeometryCollection", "geometries": [
        {"type": "MultiPoint", "coordinates": [list(ctr)] * 3},
        {"type": "Polygon", "coordinates": [[
            [b[0], b[1]], [b[2], b[1]], [b[2], b[3]], [b[0], b[3]],
            [b[0], b[1]]]]},
    ]})
    return build_acceptance_index([
        ("country.1", _mk_spans([
            ("text", "united states", ""), ("geom", tiles_poly(b), ""),
            ("center", CEN0, "")])),
        ("region.1", _mk_spans([
            ("text", "maine", ""), ("geom", tiles_poly(shrink(b, 0.9)), ""),
            ("center", CEN0, "")])),
        ("postcode.1", _mk_spans([
            ("text", "12345", ""), ("geom", tiles_poly(shrink(b, 0.8)), ""),
            ("center", CEN0, "")])),
        ("place.1", _mk_spans([
            ("text", "springfield", ""),
            ("geom", tiles_poly(shrink(b, 0.7)), ""),
            ("center", CEN0, "")])),
        ("address.1", _mk_spans([
            ("text", "fake street", ""), ("geom", addr_geom, ""),
            ("center", CEN0, ""), ("addr_numbers", "9,10,7", "")])),
        ("poi.1", _mk_spans([
            ("text", "moes tavern", ""), ("geom", json.dumps(
                {"type": "Point", "coordinates": list(ctr)}), ""),
            ("center", CEN0, "")])),
    ], cfg)


def test_multilayer_address_format(springfield_index):
    """address-format.test.js:236-241."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(springfield_index, "9 fake street", limit=1)
    assert res and res[0]["place_name"] == \
        "9 fake street springfield, maine 12345, united states"


def test_multilayer_numberless_address(springfield_index):
    """address-format.test.js:243-276: the unresolved number
    placeholder cleans up."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(springfield_index, "fake street", limit=1)
    assert res and res[0]["place_name"] == \
        "fake street springfield, maine 12345, united states"


def test_multilayer_place_format(springfield_index):
    """address-format.test.js:278-283."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(springfield_index, "springfield", limit=1)
    assert res and res[0]["place_name"] == \
        "springfield, maine 12345, united states"


def test_multilayer_poi_format(springfield_index):
    """address-format.test.js:285-290: the poi template pulls the
    CONTEXT address's name."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(springfield_index, "moes tavern", limit=1)
    assert res and res[0]["place_name"] == \
        "moes tavern, fake street springfield, maine 12345, united states"
