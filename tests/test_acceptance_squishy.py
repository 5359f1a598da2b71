"""E2E acceptance fixture: nested identically-named features — the
"New York, New York" squishy scenario (geocode-unit squishy tests /
verifymatch.js:938-965): the place inherits its identically-named
region's score so it outranks sibling places and surfaces first."""

import json

import pyarrow as pa
import pytest

from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans


def _doc(doc_id, text, geom, center, score, extra=()):
    entries = [
        ("text", text, ""),
        ("geom", json.dumps(geom), ""),
        ("center", f"{center[0]},{center[1]}", ""),
        ("score", str(score), ""),
    ] + list(extra)
    return doc_id, _mk_spans(entries)


@pytest.fixture(scope="module")
def ny_index(ray_session):
    import ray.data as rd

    from carmen_ray.index.build import build_index

    def poly(w, s, e, n):
        return {"type": "Polygon", "coordinates": [[[w, s], [e, s], [e, n], [w, n], [w, s]]]}

    rows = [
        _doc("country.1", "united states", poly(-130, 20, -60, 55), (-95, 38), 1000,
             [("synonym", "usa", "")]),
        _doc("region.1", "new york", poly(-80, 40, -71, 45), (-75.5, 42.5), 700),
        _doc("region.2", "washington", poly(-125, 45, -116, 49), (-120.5, 47), 650),
        # the nested identically-named place (should inherit region score)
        _doc("place.1", "new york", poly(-74.3, 40.5, -73.7, 41.0), (-74.0, 40.7), 300),
        # a higher-scored sibling place with a different name
        _doc("place.2", "buffalo", poly(-79.1, 42.7, -78.6, 43.1), (-78.85, 42.9), 400),
        # an identically-named far-away low place (no inheriting parent)
        _doc("place.3", "new york", poly(-120, 46, -119.5, 46.5), (-119.75, 46.25), 100),
    ]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE)),
    })
    return build_index(rd.from_arrow(tbl).repartition(1))


def test_squishy_new_york(ny_index):
    from carmen_ray.geocode.engine import IndexData, forward_one

    idx = ny_index
    index = IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score, idx.layer_zooms)
    res = forward_one(index, "new york")
    assert res
    ids = [r["feature_id"] for r in res]
    # the nested place (inheriting the region's 700) must beat both the
    # region itself is also a candidate; crucial assertion: place.1
    # outranks the non-nested identically-named place.3
    assert ids.index("place.1") < ids.index("place.3")
    p1 = next(r for r in res if r["feature_id"] == "place.1")
    p3 = next(r for r in res if r["feature_id"] == "place.3")
    assert p1["scoredist"] > p3["scoredist"], "squishy boost missing"
    # context hierarchy is assembled
    assert "region.1" in p1["context"]
    assert "country.1" in p1["context"]


def test_new_york_new_york(ny_index):
    """Explicit 'new york new york' (place + region) stacks to full
    relevance for the nested place."""
    from carmen_ray.geocode.engine import IndexData, forward_one

    idx = ny_index
    index = IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score, idx.layer_zooms)
    res = forward_one(index, "new york new york")
    assert res
    assert res[0]["feature_id"] == "place.1"
    assert res[0]["relevance"] == 1.0


def test_synonym_match(ny_index):
    from carmen_ray.geocode.engine import IndexData, forward_one

    idx = ny_index
    index = IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score, idx.layer_zooms)
    res = forward_one(index, "usa")
    assert res and res[0]["feature_id"] == "country.1"
    assert res[0]["matching_text"] == "usa"


def test_context_squishy_prefers_doubled_name(ray_session):
    """'main st new york' prefers the street whose context doubles the
    name (place 'new york' inside region 'new york') over a street in a
    differently-named region (verifymatch.js:966-975 contextSquishy)."""
    import json

    import pyarrow as pa
    import ray.data as rd

    from carmen_ray.geocode.engine import IndexData, forward_one
    from carmen_ray.index.build import build_index

    def poly(w, s, e, n):
        return {"type": "Polygon", "coordinates": [[[w, s], [e, s], [e, n], [w, n], [w, s]]]}

    def line(x, y):
        return {"type": "LineString", "coordinates": [[x, y], [x + 0.02, y + 0.01]]}

    rows = [
        _doc("country.1", "united states", poly(-130, 20, -60, 55), (-95, 38), 1000),
        _doc("region.1", "new york", poly(-80, 40, -71, 45), (-75.5, 42.5), 700),
        _doc("region.2", "albany state", poly(-102, 37, -94.6, 40), (-98.3, 38.5), 650),
        _doc("place.1", "new york", poly(-74.3, 40.5, -73.7, 41.0), (-74.0, 40.7), 300),
        _doc("place.2", "new york", poly(-99, 38, -98.5, 38.5), (-98.75, 38.25), 300),
        _doc("street.1", "main st", line(-74.0, 40.7), (-74.0, 40.7), 10),   # in ny, ny
        _doc("street.2", "main st", line(-98.75, 38.25), (-98.74, 38.26), 10),  # in ny, albany state
    ]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE)),
    })
    idx = build_index(rd.from_arrow(tbl).repartition(1))
    index = IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score, idx.layer_zooms)
    res = forward_one(index, "main st new york")
    streets = [r for r in res if r["feature_id"].startswith("street.")]
    assert len(streets) >= 2
    assert streets[0]["feature_id"] == "street.1", "doubled-name context should win"
    # the +0.01 nudge decides the ORDER, but output relevance clamps to
    # 1 after the sort (verifymatch.js:295; geocode-unit.promote-score
    # pins the displayed 1.00)
    assert streets[0]["relevance"] == 1.0
    assert streets[1]["relevance"] <= 1.0
