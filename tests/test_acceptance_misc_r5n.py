"""Round-5 tranche 14: geocode-unit.limit.test.js — forward limit
defaults to 5 with a hard cap of 10; reverse limit > 1 requires a
single type (EINVALID otherwise) and clamps to 5."""

import pytest

from acceptance_util import (_mk_spans, build_acceptance_index, point,
                             tile_box, tile_center, tiles_poly)

C32 = tile_center(6, 32, 32)
CEN0 = f"{C32[0]},{C32[1]}"
B32 = tiles_poly(tile_box(6, 32, 32))


@pytest.fixture(scope="module")
def limit_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    cfg = GeocoderConfig(layers={
        "country": LayerConfig("country", zoom=6),
        "place": LayerConfig("place", zoom=6),
        "poi": LayerConfig("poi", zoom=6),
    })
    rows = [("country.1", _mk_spans([
        ("text", "United States", ""), ("geom", B32, ""),
        ("center", CEN0, "")]))]
    for i in range(1, 21):
        rows.append((f"place.{i}", _mk_spans([
            ("text", f"place {i}", ""), ("geom", point(*C32), ""),
            ("center", CEN0, "")])))
    for i in range(1, 8):
        rows.append((f"poi.{i}", _mk_spans([
            ("text", f"rocks {i}", ""), ("geom", point(*C32), ""),
            ("center", CEN0, "")])))
    return build_acceptance_index(rows, cfg)


def test_forward_default_limit_5(limit_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(limit_index, "place")
    assert len(res) == 5
    assert len({r["place_name"] for r in res}) == 5


def test_forward_limit_1(limit_index):
    from carmen_ray.geocode.engine import forward_one

    assert len(forward_one(limit_index, "place", limit=1)) == 1


def test_forward_limit_10(limit_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(limit_index, "place", limit=10)
    assert len(res) == 10
    assert len({r["place_name"] for r in res}) == 10


def test_forward_limit_11_caps_at_10(limit_index):
    from carmen_ray.geocode.engine import forward_one

    assert len(forward_one(limit_index, "place", limit=11)) == 10


def test_reverse_limit_requires_single_type(limit_index):
    from carmen_ray.geocode.engine import reverse_one

    with pytest.raises(ValueError,
                       match="limit must be combined with a single type"):
        reverse_one(limit_index, C32[0], C32[1], limit=2)


def test_reverse_limit_with_type(limit_index):
    from carmen_ray.geocode.engine import reverse_one

    res = reverse_one(limit_index, C32[0], C32[1], limit=2, types=["poi"])
    assert len(res) == 2
    res = reverse_one(limit_index, C32[0], C32[1], limit=7, types=["poi"])
    assert len(res) == 5  # reverse clamp (geocode.js:217)
