"""bbox option filter + validation — port of
/root/reference/test/acceptance/geocode-unit.bbox.test.js.

99 'Main Street' twins at tile 6/14/18 (center −100,60), one at
6/32/32 (0,0), one 'Date Line Street' at 2/0/1 (−180,40): an invalid
bbox errors EINVALID (geocode.js:126-142), no bbox returns the limit-5
page of dupes, bbox [−1,−1,1,1] filters to the single origin feature.
"""

import pytest

from acceptance_util import _mk_spans, build_acceptance_index, point


@pytest.fixture(scope="module")
def bbox_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    # no context containment in play — raw reference centers are fine
    rows = []
    for i in range(1, 100):
        rows.append((f"street.{i}", _mk_spans([
            ("text", "Main Street", ""),
            ("geom", point(-100.0, 60.0), ""),
            ("center", "-100,60", ""),
            ("score", "2", "")])))
    rows.append(("street.102", _mk_spans([
        ("text", "Main Street", ""),
        ("geom", point(0.0, 0.0), ""),
        ("center", "0,0", ""),
        ("score", "1", "")])))
    rows.append(("street.103", _mk_spans([
        ("text", "Date Line Street", ""),
        ("geom", point(-180.0, 40.0), ""),
        ("center", "-180,40", ""),
        ("score", "1", "")])))
    cfg = GeocoderConfig(layers={
        "street": LayerConfig("street", zoom=6, geocoder_address=True)})
    return build_acceptance_index(rows, cfg)


@pytest.mark.parametrize("bad", [
    [-1.0, -1.0, 1.0],          # array length 3
    [-1.0, -1.0, 1.0, "a"],     # non-numeric param
    [-180, -90, 180, 91],       # maxY out of bounds
    [10, 0, -10, 1],            # minX > maxX
    [0, 10, 1, -10],            # minY > maxY
])
def test_invalid_bbox_errors(bbox_index, bad):
    from carmen_ray.geocode.engine import forward_one

    with pytest.raises(ValueError):
        forward_one(bbox_index, "Main St", bbox=bad, allow_dupes=True)


def test_no_bbox_returns_limit_page(bbox_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(bbox_index, "Main St", allow_dupes=True)
    assert len(res) == 5


def test_bbox_filters_to_origin_feature(bbox_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(bbox_index, "Main St", bbox=[-1.0, -1.0, 1.0, 1.0],
                      allow_dupes=True)
    assert len(res) == 1
    assert res[0]["feature_id"] == "street.102"
