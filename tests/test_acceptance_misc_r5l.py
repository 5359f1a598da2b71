"""Round-5 tranche 12: geocode-unit.address-vs-postcode.test.js — a
5-digit token that is both a postcode and a housenumber prefers the
postcode stack ('Quincy MA 02169' → the Massachusetts postcode, not
'02169 Maine St' in Quincy, Illinois), and bare numeric autocomplete
('0216') completes into the postcode."""

import json

import pytest

from acceptance_util import (_mk_spans, build_acceptance_index, multipoint,
                             tile_box, tiles_poly)

# two z6 tiles ~10° apart: Illinois city at (0,0)-ish, Massachusetts
# city at (10,0)-ish
IL_BOX = tile_box(6, 32, 32)
MA_BOX = tile_box(6, 33, 32)


def _ctr(box):
    return ((box[0] + box[2]) / 2, (box[1] + box[3]) / 2)


IL = _ctr(IL_BOX)
MA = _ctr(MA_BOX)


@pytest.fixture(scope="module")
def avp_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    def shrink(box, f=0.5):
        w, s, e, n = box
        cx, cy = (w + e) / 2, (s + n) / 2
        return (cx - (cx - w) * f, cy - (cy - s) * f,
                cx + (e - cx) * f, cy + (n - cy) * f)

    cfg = GeocoderConfig(layers={
        "region": LayerConfig("region", zoom=6),
        "place": LayerConfig("place", zoom=6),
        "postcode": LayerConfig("postcode", zoom=6),
        "address": LayerConfig("address", zoom=6, geocoder_address=True),
    })
    return build_acceptance_index([
        ("region.1", _mk_spans([
            ("text", "Massachusetts, MA", ""),
            ("geom", tiles_poly(MA_BOX), ""),
            ("center", f"{MA[0]},{MA[1]}", "")])),
        ("region.2", _mk_spans([
            ("text", "Illinois, IL", ""),
            ("geom", tiles_poly(IL_BOX), ""),
            ("center", f"{IL[0]},{IL[1]}", "")])),
        ("place.1", _mk_spans([
            ("text", "Quincy", ""),
            ("geom", tiles_poly(shrink(IL_BOX)), ""),
            ("center", f"{IL[0]},{IL[1]}", "")])),
        ("place.2", _mk_spans([
            ("text", "Quincy", ""),
            ("geom", tiles_poly(shrink(MA_BOX)), ""),
            ("center", f"{MA[0]},{MA[1]}", "")])),
        ("postcode.1", _mk_spans([
            ("text", "02169", ""),
            ("geom", tiles_poly(shrink(MA_BOX, 0.25)), ""),
            ("center", f"{MA[0]},{MA[1]}", "")])),
        ("address.1", _mk_spans([
            ("text", "Maine St", ""),
            ("geom", multipoint(IL), ""),
            ("center", f"{IL[0]},{IL[1]}", ""),
            ("addr_numbers", "02169", "")])),
    ], cfg)


def test_postcode_beats_address_number(avp_index):
    """'Quincy MA 02169' → '02169, Quincy, Massachusetts'
    (address-vs-postcode.test.js:114-120)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(avp_index, "Quincy MA 02169", limit=1)
    assert res and res[0]["place_name"] == "02169, Quincy, Massachusetts"


def test_numeric_autocomplete_into_postcode(avp_index):
    """'0216' → the postcode via autocomplete
    (address-vs-postcode.test.js:122-128)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(avp_index, "0216", limit=1)
    assert res and res[0]["place_name"] == "02169, Quincy, Massachusetts"
