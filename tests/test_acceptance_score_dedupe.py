"""Ghost-vs-scored text dedupe — the geocode-unit.score-dedupe.test.js
port: the filter is ORDER dependent (verifymatch.js:659-672): a ghost
(score < 0) is dropped only when a better-ranked scored feature with
identical text already passed; a spatially-aligned ghost that outranks
its scored twin survives at rank 0."""

import json

import pyarrow as pa
import pytest

from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans


def _doc(doc_id, text, geom, center, score):
    return doc_id, _mk_spans([
        ("text", text, ""),
        ("geom", json.dumps(geom), ""),
        ("center", f"{center[0]},{center[1]}", ""),
        ("score", str(score), ""),
    ])


@pytest.fixture(scope="module")
def ghost_index(ray_session):
    import ray.data as rd

    from carmen_ray.index.build import build_index

    region_poly = {"type": "Polygon",
                   "coordinates": [[[-1, -1], [1, -1], [1, 1], [-1, 1], [-1, -1]]]}
    rows = [
        # ghost twin inside the region
        _doc("place.1", "fake place 1", {"type": "Point", "coordinates": [0, 0]},
             (0, 0), -1),
        # scored twin OUTSIDE the region
        _doc("place.2", "fake place 1", {"type": "Point", "coordinates": [0, 1.01]},
             (0, 1.01), 1),
        _doc("place.3", "fake place", {"type": "Point", "coordinates": [0, 0]},
             (0, 0), 1),
        _doc("region.10", "region", region_poly, (0, 0), 1),
    ]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE)),
    })
    return build_index(rd.from_arrow(tbl).repartition(1))


def _index(idx):
    from carmen_ray.geocode.engine import IndexData

    return IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                     idx.layer_zooms)


def test_scored_twin_evicts_ghost(ghost_index):
    """'fake place 1': the scored twin outranks the ghost (ghost
    penalty) and the ghost is deduped away."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(_index(ghost_index), "fake place 1")
    ids = [r["feature_id"] for r in res]
    assert ids[0] == "place.2"
    assert "place.1" not in ids
    assert len(ids) == 2  # place.2 + the partial 'fake place'


def test_aligned_ghost_survives(ghost_index):
    """'fake place 1 region': the ghost spatially aligns with the
    region (full relevance); its scored twin does not — the ghost wins
    rank 0 and is NOT deduped away."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(_index(ghost_index), "fake place 1 region")
    assert res
    assert res[0]["feature_id"] == "place.1"
    assert res[0]["relevance"] == pytest.approx(1.0)


def test_promote_score_across_layers(ray_session):
    """geocode-unit.promote-score port (headline case): identically
    named features across layers — the higher-scored region outranks
    both the lower-scored country and place at equal relevance."""
    import json as _json

    import pyarrow as pa
    import ray.data as rd

    from carmen_ray.geocode.engine import IndexData, forward_one
    from carmen_ray.index.build import build_index

    def poly(w, s, e, n):
        return {"type": "Polygon",
                "coordinates": [[[w, s], [e, s], [e, n], [w, n], [w, s]]]}

    rows = [
        _doc("country.1", "usa", poly(-20, -20, 20, 20), (0, 0), 1000000),
        _doc("country.2", "georgia", poly(40, 40, 50, 50), (45, 45), 10),
        _doc("region.1", "georgia", poly(-20, -20, 20, 20), (0, 0), 50),
        _doc("place.1", "georgia", poly(42, 42, 48, 48), (45, 45), 1),
    ]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE)),
    })
    idx = build_index(rd.from_arrow(tbl).repartition(1))
    index = IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                      idx.layer_zooms)
    res = forward_one(index, "georgia")
    assert res
    assert res[0]["feature_id"] == "region.1"
    assert res[0]["relevance"] == pytest.approx(1.0)
