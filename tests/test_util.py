"""Grid encoding, permute masks, proximity math, bbox, hashes, geometry,
cells — parity where the reference has unit tests, invariants elsewhere."""

import math

import numpy as np
import pytest

from carmen_ray.geom import wkb
from carmen_ray.geom.cells import hex_cell, s2_cell, s2_level, s2_parent
from carmen_ray.geom.ops import (
    dist_point_to_geom_miles,
    geom_bbox,
    point_in_geom,
    point_in_polygon,
)
from carmen_ray.geom.tile import cover, lonlat_to_tile, scale_to_zoom
from carmen_ray.util import bbox as bboxutil
from carmen_ray.util import grid
from carmen_ray.util.hashing import fnv1a_32, fnv1a_64, murmur3_32
from carmen_ray.util.jsmath import fround, js_round, round_to
from carmen_ray.util.permute import all_masks, continuous_masks
from carmen_ray.util.proximity import (
    center2zxy,
    distscore,
    gauss,
    haversine_miles,
    relevance_score,
    scale_radius,
    scoredist,
    variance,
)


def test_grid_roundtrip():
    enc = grid.encode([100], [200], [1.0], [3], [12345])
    dec = grid.decode(enc)
    assert dec["x"][0] == 100
    assert dec["y"][0] == 200
    assert dec["relev"][0] == 1.0
    assert dec["score"][0] == 3
    assert dec["id"][0] == 12345


def test_grid_relev_buckets():
    for relev in (0.4, 0.6, 0.8, 1.0):
        enc = grid.encode([1], [1], [relev], [0], [1])
        assert grid.decode(enc)["relev"][0] == pytest.approx(relev)
    # JS float parity: (0.5-0.4)/0.2 === 0.4999999…, Math.round → 0 → bucket 0.4
    enc = grid.encode([1], [1], [0.5], [0], [1])
    assert grid.decode(enc)["relev"][0] == pytest.approx(0.4)
    enc = grid.encode([1], [1], [0.55], [0], [1])
    assert grid.decode(enc)["relev"][0] == pytest.approx(0.6)


def test_grid_id_wraps_20bit():
    enc = grid.encode([0], [0], [1.0], [0], [(1 << 20) + 7])
    assert grid.decode(enc)["id"][0] == 7


def test_permute_all():
    # permute.js: all() sorted by popcount desc then value asc
    masks = all_masks(3)
    assert masks[0] == 0b111
    assert set(masks) == set(range(1, 8))
    pops = [bin(m).count("1") for m in masks]
    assert pops == sorted(pops, reverse=True)


def test_permute_continuous():
    masks = continuous_masks(3)
    assert masks[0] == 0b111
    assert list(masks) == [0b111, 0b011, 0b110, 0b001, 0b010, 0b100]


def test_js_round():
    assert js_round(0.5) == 1
    assert js_round(-0.5) == 0
    assert js_round(-1.5) == -1
    assert js_round(2.5) == 3
    assert round_to(0.123456789, 4) == 0.1235
    assert fround(math.log(100)) == float(np.float32(math.log(100)))


def test_murmur_fnv_deterministic():
    assert murmur3_32("") == 0
    assert murmur3_32("hello") == murmur3_32("hello")
    assert murmur3_32("hello") != murmur3_32("hellp")
    # published FNV-1a test vectors
    assert fnv1a_32("") == 0x811C9DC5
    assert fnv1a_32("a") == 0xE40C292C
    assert fnv1a_64("") == 0xCBF29CE484222325
    assert fnv1a_64("a") == 0xAF63DC4C8601EC8C


def test_haversine():
    # NYC → LA ≈ 2445 miles
    d = float(haversine_miles(-74.0060, 40.7128, -118.2437, 34.0522))
    assert 2420 < d < 2470


def test_center2zxy():
    z, x, y = center2zxy(0.0, 0.0, 14)
    assert (z, x, y) == (14, 8192, 8192)
    z, x, y = center2zxy(-200.0, 95.0, 2)  # clamps
    assert z == 2 and 0 <= x <= 4 and 0 <= y <= 4


def test_scoredist_monotonic_in_distance():
    near = float(scoredist(100, 0, 1000, 1.0, 14))
    far = float(scoredist(100, 0, 1000, 90.0, 14))
    assert near > far
    assert 1 <= far <= 5000 and near <= 5000


def test_gauss_variance():
    v = variance(0.75, 0.5)
    assert gauss(0.0, v) == pytest.approx(1.0)
    assert gauss(0.75, v) == pytest.approx(0.5)


def test_scale_radius():
    assert scale_radius(6) == 1800
    assert scale_radius(12) == 600
    assert scale_radius(14) == 100


def test_distscore():
    assert float(distscore(10.0, 5.0)) == pytest.approx(5.0 * (1000 / 35.0), abs=1e-4)
    assert float(distscore(1000.0, 5.0)) == pytest.approx(5.0)


def test_relevance_score():
    full = relevance_score(1.0, 5000.0)
    assert full == pytest.approx(0.6 * (1.0 - 0.0008) + 0.4)
    ghost = relevance_score(1.0, 5000.0, address="1", ghost=True)
    assert ghost < relevance_score(1.0, 5000.0, address="1")


def test_wkb_roundtrip():
    geoms = [
        {"type": "Point", "coordinates": [1.5, -2.5]},
        {"type": "MultiPoint", "coordinates": [[0, 0], [1, 1]]},
        {"type": "LineString", "coordinates": [[0, 0], [1, 1], [2, 0]]},
        {"type": "Polygon", "coordinates": [[[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]]},
        {"type": "MultiPolygon", "coordinates": [[[[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]]]]},
        {
            "type": "GeometryCollection",
            "geometries": [
                {"type": "Point", "coordinates": [5, 5]},
                {"type": "MultiPoint", "coordinates": [[6, 6], [7, 7]]},
            ],
        },
    ]
    for g in geoms:
        assert wkb.decode(wkb.encode(g)) == _as_floats(g)


def _as_floats(g):
    if g["type"] == "GeometryCollection":
        return {"type": g["type"], "geometries": [_as_floats(x) for x in g["geometries"]]}

    def conv(c):
        if isinstance(c, (int, float)):
            return float(c)
        return [conv(x) for x in c]

    return {"type": g["type"], "coordinates": conv(g["coordinates"])}


def test_point_in_polygon():
    square = [[[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]]
    assert point_in_polygon(5, 5, square)
    assert not point_in_polygon(15, 5, square)
    holed = square + [[[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]]]
    assert not point_in_polygon(5, 5, holed)
    assert point_in_polygon(1, 1, holed)


def test_geom_bbox_and_dist():
    poly = {"type": "Polygon", "coordinates": [[[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]]]}
    assert geom_bbox(poly) == [0, 0, 2, 2]
    assert point_in_geom(1, 1, poly)
    assert dist_point_to_geom_miles(1, 1, poly) == 0.0
    d = dist_point_to_geom_miles(3, 1, poly)
    assert 60 < d < 75  # ~1 degree lon at equator ≈ 69 mi


def test_tile_cover_point():
    x, y = lonlat_to_tile(0.0, 0.0, 1)
    assert (int(x), int(y)) == (1, 1)
    assert cover({"type": "Point", "coordinates": [-77.0, 38.9]}, 6) == [(18, 24)]


def test_tile_cover_polygon_fills():
    poly = {"type": "Polygon", "coordinates": [[[-10, -10], [10, -10], [10, 10], [-10, 10], [-10, -10]]]}
    tiles = cover(poly, 6)
    assert (31, 31) in tiles and (32, 32) in tiles
    assert len(tiles) >= 16


def test_scale_to_zoom():
    x, y = scale_to_zoom(np.array([1]), np.array([2]), 6, 14)
    assert (x[0], y[0]) == (256, 512)
    x, y = scale_to_zoom(np.array([256]), np.array([512]), 14, 6)
    assert (x[0], y[0]) == (1, 2)


def test_bbox_utils():
    assert bboxutil.inside([0, 0], [-1, -1, 1, 1])
    assert not bboxutil.inside([2, 0], [-1, -1, 1, 1])
    assert bboxutil.intersect([0, 0, 2, 2], [1, 1, 3, 3])
    assert bboxutil.intersection([0, 0, 2, 2], [1, 1, 3, 3]) == [1, 1, 2, 2]
    assert bboxutil.intersection([0, 0, 1, 1], [2, 2, 3, 3]) is False
    # AM-crossing
    assert bboxutil.am_inside([179.5, 0], [170, -10, -170, 10])
    assert bboxutil.am_inside([-179.5, 0], [170, -10, -170, 10])
    assert not bboxutil.am_inside([0, 0], [170, -10, -170, 10])
    assert bboxutil.am_intersect([170, -10, -170, 10], [-180, -5, -175, 5])
    # keeps the larger side of the AM split (eastern here: -180..-160)
    assert bboxutil.clip_bbox([170, -10, -160, 10]) == [-179.9, -10, -160, 10]
    assert bboxutil.clip_bbox([160, -10, -170, 10]) == [160, -10, 179.9, 10]


def test_s2_invariants():
    c9 = s2_cell(-77.0, 38.9, 9)
    c12 = s2_cell(-77.0, 38.9, 12)
    assert s2_level(c9) == 9
    assert s2_level(c12) == 12
    # parent of the finer cell at level 9 is the level-9 cell
    assert s2_parent(c12, 9) == c9
    # distinct points → distinct leaf-ish cells
    assert s2_cell(-77.0, 38.9, 20) != s2_cell(-77.1, 38.9, 20)
    # nearby points share a coarse cell
    assert s2_cell(-77.0, 38.9, 4) == s2_cell(-77.1, 38.95, 4)
    # face sanity: 6 distinct faces for axis points
    faces = {s2_cell(lon, lat, 0) for lon, lat in [(0, 0), (90, 0), (180, 0), (-90, 0), (0, 90), (0, -90)]}
    assert len(faces) == 6


def test_bulk_cells_bit_identical_to_scalar():
    """The vectorized batch kernels (s2_cells / hex_cells) must be
    bit-identical to the per-point scalars they replace — including face
    boundaries, poles, the antimeridian seam, and clip extremes."""
    from carmen_ray.geom.cells import hex_cells, s2_cells

    rng = np.random.default_rng(42)
    lon = np.concatenate([
        rng.uniform(-180, 180, 500),
        np.array([0.0, 90.0, 180.0, -180.0, -90.0, 45.0, -45.0, 179.999999]),
    ])
    lat = np.concatenate([
        rng.uniform(-85, 85, 500),
        np.array([0.0, 90.0, -90.0, 85.1, -85.1, 45.0, -45.0, 0.0]),
    ])
    for level in (0, 4, 12, 20, 30):
        bulk = s2_cells(lon, lat, level)
        scal = np.array([s2_cell(float(a), float(b), level) for a, b in zip(lon, lat)],
                        dtype=np.uint64)
        assert (bulk == scal).all(), level
    for res in (0, 7, 8, 9, 15):
        bulk = hex_cells(lon, lat, res)
        scal = np.array([hex_cell(float(a), float(b), res) for a, b in zip(lon, lat)],
                        dtype=np.uint64)
        assert (bulk == scal).all(), res


def test_hex_cells():
    a = hex_cell(-77.0, 38.9, 9)
    b = hex_cell(-77.0000001, 38.9000001, 9)
    assert a == b  # tiny perturbation stays in the same cell
    assert hex_cell(-77.0, 38.9, 7) != hex_cell(-77.0, 38.9, 9)  # res in id
    assert hex_cell(10.0, 50.0, 9) != hex_cell(-77.0, 38.9, 9)


def test_phrase_hash_reference_parity():
    """Bit-exact with murmurhash-native as pinned by the reference's
    termops.getIndexableText.test.js fixtures."""
    from carmen_ray.util.hashing import phrase_hash

    assert phrase_hash("Main Street") == 248
    assert phrase_hash("Main Street Lane") == 255
    assert phrase_hash("Main Street St Lane") == 13
    assert phrase_hash("Äpfelstrüdeln Strasse") == 73


def test_scoredist_reference_parity():
    """proximity.scoredist.test.js 'new york near san francisco' —
    exact scoredist values to 6 places."""
    min_score, max_score = -1, 1634443
    cases = [
        (2426.866703400975, 79161, 6, 25.168365),   # region
        (2567.3550038898834, 31104, 12, 10.496437), # place
        (0.6450163846417221, 3, 14, 10.008055),     # poi
        (0.4914344651849769, 1, 14, 10.003694),     # poi
    ]
    for dist, score, zoom, want in cases:
        got = round(float(scoredist(score, min_score, max_score, dist, zoom)), 6)
        assert got == pytest.approx(want, abs=1e-6), (dist, score, zoom)


def test_proximity_distance_reference_parity():
    """proximity.test.js distance cases (miles, cover-corner bound)."""
    from carmen_ray.util.proximity import distance

    assert distance((0, 0), (0, 0), 0, 0, 2) == 0
    d1 = distance((-170, 0), (0, 0), 0, 1, 2)
    assert d1 == pytest.approx(5944.221764504916, abs=1e-6)
    # center further than furthest corner → corner bound wins
    d2 = distance((-170, 0), (10, 0), 0, 1, 2)
    assert d2 == pytest.approx(5944.221764504916, abs=1e-6)


def test_distscore_reference_parity():
    """proximity.test.js distscore cases."""
    assert float(distscore(50, 10)) == 200
    assert float(distscore(500, 10000)) == 20000


def test_center2zxy_reference_parity():
    assert center2zxy(0, 0, 5) == (5, 16, 16)
    assert center2zxy(-90, 45, 5) == (5, 8, 12)
    assert center2zxy(-181, 90.1, 5) == (5, 0, 0)
    assert center2zxy(181, -90.1, 5) == (5, 32, 32)


def test_relevance_score_reference_parity():
    """proximity.relevanceScore.test.js:22-34 (JS undefined address →
    our 'n/a' sentinel; JS null → Python None)."""
    assert relevance_score(0, 1, address="n/a") == 0
    assert relevance_score(1, 5000, address="n/a") == 1
    assert relevance_score(1, 1, address=None) < relevance_score(1, 5000, address="n/a")
    assert relevance_score(1, 1, address="123", ghost=True) < relevance_score(1, 5000, address="123")
    assert relevance_score(0, 1, address=None) == 0
    assert relevance_score(0, 1, address="123", ghost=True) == 0


def test_inside_tile_reference_parity():
    """bbox.xyz.test.js — sphericalmercator.xyz semantics."""
    assert bboxutil.inside_tile([-78, 38, -76, 40], 5) == [5, 9, 12, 9, 12]


def test_permute_all_reference_parity():
    """permute.test.js:15-59 — exact mask order for all()."""
    assert [len(all_masks(n)) for n in range(1, 11)] == \
        [1, 3, 7, 15, 31, 63, 127, 255, 511, 1023]
    assert list(all_masks(2)) == [0b11, 0b01, 0b10]
    assert list(all_masks(3)) == [0b111, 0b011, 0b101, 0b110, 0b001, 0b010, 0b100]
    assert list(all_masks(4)) == [
        0b1111,
        0b0111, 0b1011, 0b1101, 0b1110,
        0b0011, 0b0101, 0b0110, 0b1001, 0b1010, 0b1100,
        0b0001, 0b0010, 0b0100, 0b1000,
    ]


def test_permute_continuous_reference_parity():
    """permute.test.js:63-92 — exact continuous() emission order."""
    assert list(continuous_masks(4)) == [
        0b1111, 0b0111, 0b1110, 0b0011, 0b0110, 0b1100,
        0b0001, 0b0010, 0b0100, 0b1000,
    ]
