"""Cutoff knobs — the geocode-unit.cutoffs.test.js port:
per-query max_correction_length gates fuzzy search by token count;
per-query verifymatch_stack_limit bounds how many candidate stacks are
verified (geocode.js:60 options)."""

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


def _poly(w, s, e, n):
    return {"type": "Polygon",
            "coordinates": [[[w, s], [e, s], [e, n], [w, n], [w, s]]]}


@pytest.fixture(scope="module")
def cutoff_index(ray_session):
    import ray.data as rd

    from carmen_ray.index.build import build_index

    rows = [
        _doc("country.1", "united states", _poly(-1, -0.5, 1, 0.5), (0, 0), 100),
        _doc("country.2", "united kingdom", _poly(-1, 0.5, 1, 1.5), (0, 1), 100),
    ]
    # places 1..11 in the US at [0,0]; 'place 1' also in the UK at [0,1]
    for i in range(1, 12):
        rows.append(_doc(f"place.{i}", f"place {i}",
                         {"type": "Point", "coordinates": [0, 0]}, (0, 0), 10))
    rows.append(_doc("place.50", "place 1",
                     {"type": "Point", "coordinates": [0, 1]}, (0, 1), 10))
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE)),
    })
    return build_index(rd.from_arrow(tbl).repartition(1))


def _index(idx):
    from carmen_ray.geocode.engine import IndexData

    return IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                     idx.layer_zooms)


def test_max_correction_length_zero_disables_fuzzy(cutoff_index):
    """max_correction_length=0: no fuzzy search is attempted — the
    misspelled query only partial-matches (relevance < 0.6)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(_index(cutoff_index),
                      "place places 11 unitted states america however extreme",
                      max_correction_length=0)
    assert res
    assert res[0]["relevance"] < 0.6


def test_max_correction_length_default_fuzzes(cutoff_index):
    """Default cap (8 tokens ≥ 6-token query): fuzzy corrects
    'places' → 'place' and 'unitted' → 'united'."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(_index(cutoff_index), "places place 11 unitted states")
    assert res
    assert res[0]["feature_id"] == "place.11"
    assert res[0]["relevance"] > 0.6


def test_verifymatch_stack_limit_one(cutoff_index):
    """verifymatch_stack_limit=1 verifies only the best stack — the UK
    twin never surfaces."""
    from carmen_ray.geocode.engine import forward_one

    stats = {}
    res = forward_one(_index(cutoff_index), "place 1 united",
                      verifymatch_stack_limit=1, _stats=stats)
    assert res
    assert res[0]["feature_id"] == "place.1"
    assert res[0]["center_lat"] == pytest.approx(0.0)
    assert all(r["feature_id"] != "place.50" for r in res)


def test_verifymatch_stack_limit_wide(cutoff_index):
    """A wide limit verifies both twins; US wins, UK included."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(_index(cutoff_index), "place 1 united",
                      verifymatch_stack_limit=30)
    ids = [r["feature_id"] for r in res]
    assert ids[0] == "place.1"
    assert "place.50" in ids
