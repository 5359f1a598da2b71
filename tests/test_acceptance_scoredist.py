"""Proximity scoredist — port of
/root/reference/test/acceptance/geocode-unit.scoredist.test.js.

The verify-stage scoredist normalizes the raw feature score against the
geocoder's AUTHORED score bounds (tileJSON minscore/maxscore meta — the
fixture sets maxscore=100000 over an observed max of 10000), so a
superscored-but-far feature beats nearby noise, while a merely
higher-scored far feature loses to the nearest real candidate."""

import json

import pyarrow as pa
import pytest

from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans


def _build(rows, cfg):
    import ray.data as rd

    from carmen_ray.geocode.engine import IndexData
    from carmen_ray.index.build import build_index

    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows]),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE))})
    idx = build_index(rd.from_arrow(tbl).repartition(1), config=cfg)
    return IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                     idx.layer_zooms, config=cfg)


def _doc(doc_id, text, lon, lat, score):
    return (doc_id, _mk_spans([
        ("text", text, ""),
        ("geom", json.dumps({"type": "Point", "coordinates": [lon, lat]}), ""),
        ("center", f"{lon},{lat}", ""),
        ("score", str(score), "")]))


@pytest.fixture(scope="module")
def addr_index(ray_session):
    """address source at maxzoom 6 with authored maxscore 100000
    (scoredist.test.js:16-18): two signals + 99 noise."""
    from carmen_ray.config import GeocoderConfig, LayerConfig

    rows = [_doc("address.200", "main st", -179.99, 85, 10000),
            _doc("address.201", "main st", 20, 0, 1000)]
    rows += [_doc(f"address.{i}", "main st", 0, 0, 50) for i in range(1, 100)]
    cfg = GeocoderConfig(layers={
        "address": LayerConfig("address", zoom=6, geocoder_address=True,
                               maxscore=100000)})
    return _build(rows, cfg)


def test_superscored_far_feature_wins(addr_index):
    """proximity [10,10]: the score-10000 feature beats everything
    despite being half a world away (scoredist.test.js:66-72)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(addr_index, "main st", proximity=(10, 10), limit=1)
    assert res[0]["feature_id"] == "address.200"


def test_nearest_beats_higher_score(addr_index):
    """proximity [20,3]: the nearby score-1000 feature beats the far
    score-10000 one (scoredist.test.js:74-80)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(addr_index, "main st", proximity=(20, 3), limit=1)
    assert res[0]["feature_id"] == "address.201"


def test_z14_superscored_nearby(ray_session):
    """poi source at z14, maxscore 350: the score-300 poi one tile away
    beats 99 closer score-10 twins (scoredist.test.js:89-141)."""
    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import forward_one

    rows = [_doc("poi.200", "airport", -92.098388671875, 85.03118586530456, 300)]
    rows += [_doc(f"poi.{i}", "airport", -92.098388671875, 85.03308863057421, 10)
             for i in range(1, 100)]
    cfg = GeocoderConfig(layers={"poi": LayerConfig("poi", zoom=14,
                                                    maxscore=350)})
    ix = _build(rows, cfg)
    res = forward_one(ix, "airport", proximity=(-92.09, 85.05), limit=1)
    assert res[0]["feature_id"] == "poi.200"


def test_authored_bounds_flow_to_index(addr_index):
    """geocoder.maxScore is the authored bound, not the observed max."""
    assert addr_index.max_score == 100000.0
