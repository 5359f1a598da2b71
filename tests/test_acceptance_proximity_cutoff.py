"""Proximity keeps the closest twin past coalesce cutoffs — port of
/root/reference/test/acceptance/geocode-unit.proximity-cutoff.test.js.

101 'san francisco' features along the z12 diagonal; the one nearest
the proximity point has the LOWEST score and still surfaces first —
the grid cap must order by scoredist, not raw score.
"""

import pytest

from acceptance_util import _mk_spans, build_acceptance_index, point


@pytest.fixture(scope="module")
def cutoff_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    def tcenter(i):
        n = 2 ** 12
        lon = (i + 0.5) / n * 360.0 - 180.0
        import math
        lat = math.degrees(math.atan(math.sinh(
            math.pi * (1 - 2 * (i + 0.5) / n))))
        return lon, lat

    rows = []
    for i in range(1980, 2080):
        lon, lat = tcenter(i)
        rows.append((f"place.{i}", _mk_spans([
            ("text", "san francisco", ""),
            ("geom", point(lon, lat), ""),
            ("center", f"{lon},{lat}", ""),
            ("score", "4", "")])))
    lon, lat = tcenter(2080)
    rows.append(("place.2080", _mk_spans([
        ("text", "san francisco", ""),
        ("geom", point(lon, lat), ""),
        ("center", f"{lon},{lat}", ""),
        ("score", "3", "")])))
    cfg = GeocoderConfig(layers={
        "place": LayerConfig("place", zoom=12, maxscore=1670000)})
    return build_acceptance_index(rows, cfg)


def test_closest_survives_cutoff(cutoff_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(cutoff_index, "san", proximity=(3.0, -3.0))
    assert res[0]["feature_id"] == "place.2080"
