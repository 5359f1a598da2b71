"""Round-5 tranche 8: geocode-unit.format-override.test.js —
per-feature carmen:format / carmen:format_{lang} templates override
the source format at render ({{type.name}} / {{type.number}}
placeholders, language selection via closest label, unresolved
placeholders cleaned up)."""

import pytest

from acceptance_util import (_mk_spans, build_acceptance_index, multipoint,
                             point, tile_box, tile_center, tiles_poly)

C32 = tile_center(6, 32, 32)
CEN0 = f"{C32[0]},{C32[1]}"
B32 = tiles_poly(tile_box(6, 32, 32))


@pytest.fixture(scope="module")
def fmt_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    cfg = GeocoderConfig(layers={
        "country": LayerConfig("country", zoom=6),
        "postcode": LayerConfig("postcode", zoom=6),
        "address": LayerConfig("address", zoom=6, geocoder_address=True),
    })
    return build_acceptance_index([
        ("address.1", _mk_spans([
            ("text", "fake street", ""),
            ("geom", multipoint(C32, C32, C32), ""), ("center", CEN0, ""),
            ("addr_numbers", "9B,10C,7", ""),
            ("format", "X {{address.number}} {{address.name}}, "
                       "{{postcode.name}}, {{country.name}}", ""),
            ("format:en", "Y {{address.number}} {{address.name}}, "
                          "{{postcode.name}}, {{country.name}}", "")])),
        ("address.2", _mk_spans([
            ("text", "other street", ""),
            ("geom", multipoint(C32, C32, C32), ""), ("center", CEN0, ""),
            ("addr_numbers", "9B,10C,7", "")])),
        ("postcode.3", _mk_spans([
            ("text", "12345", ""), ("geom", B32, ""), ("center", CEN0, ""),
            ("format", "Z {{postcode.name}}, {{country.name}}", "")])),
        ("country.4", _mk_spans([
            ("text", "america", ""), ("geom", B32, ""),
            ("center", CEN0, "")])),
    ], cfg)


def test_format_override_address(fmt_index):
    """format-override.test.js:93-99."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(fmt_index, "9b fake street", limit=1)
    assert res and res[0]["place_name"] == \
        "X 9b fake street, 12345, america"


def test_format_override_untemplated_sibling(fmt_index):
    """format-override.test.js:101-107: the sibling without a template
    renders normally."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(fmt_index, "9b other street", limit=1)
    assert res and res[0]["place_name"] == "9b other street, 12345, america"


@pytest.mark.parametrize("lang", ["en", "en-XX"])
def test_format_override_language(fmt_index, lang):
    """format-override.test.js:109-123: carmen:format_en selected for
    'en' and for the approximate 'en-XX'."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(fmt_index, "9b fake street", limit=1, language=lang)
    assert res and res[0]["place_name"] == \
        "Y 9b fake street, 12345, america"


def test_format_override_postcode(fmt_index):
    """format-override.test.js:125-131."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(fmt_index, "12345", limit=1)
    assert res and res[0]["place_name"] == "Z 12345, america"
