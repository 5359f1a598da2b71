"""E2E acceptance fixture: proximity vs score ordering for
identically-named features across layers — the geocode-unit.proximity /
scoredist shape ("kansas" the region vs "kansas" the city)."""

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
def kansas_index(ray_session):
    import ray.data as rd

    from carmen_ray.index.build import build_index

    def poly(w, s, e, n):
        return {"type": "Polygon", "coordinates": [[[w, s], [e, s], [e, n], [w, n], [w, s]]]}

    rows = [
        _doc("country.1", "united states", poly(-130, 20, -60, 55), (-95, 38), 1000),
        # the region: big score, big polygon
        _doc("region.1", "kansas", poly(-102, 37, -94.6, 40), (-98.3, 38.5), 800),
        _doc("region.2", "eastland", poly(-80, 35, -70, 42), (-75, 38.5), 750),
        # the identically-named city ~1,700 mi east of the region — far
        # enough that the z≤6 gaussian (radius 1800 mi) decays hard
        _doc("place.1", "kansas", poly(-75.2, 38.9, -74.8, 39.3), (-75.0, 39.1), 200),
        # a distractor place
        _doc("place.2", "topeka", poly(-95.8, 38.9, -95.5, 39.1), (-95.68, 39.05), 150),
    ]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE)),
    })
    return build_index(rd.from_arrow(tbl).repartition(1))


def _index(idx):
    from carmen_ray.geocode.engine import IndexData

    return IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score, idx.layer_zooms)


def test_no_proximity_score_wins(kansas_index):
    """Without proximity the high-scored region outranks the city."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(_index(kansas_index), "kansas")
    assert res[0]["feature_id"] == "region.1"
    assert any(r["feature_id"] == "place.1" for r in res)


def test_proximity_near_city_flips(kansas_index):
    """Proximity next to the city pulls the city to rank 0
    (scoredist gaussian decay beats raw score)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(_index(kansas_index), "kansas", proximity=(-75.0, 39.1))
    assert res[0]["feature_id"] == "place.1"
    # both candidates still present, same textual relevance
    ids = {r["feature_id"] for r in res}
    assert "region.1" in ids
    relevs = {r["feature_id"]: r["relevance"] for r in res}
    assert relevs["place.1"] == relevs["region.1"]


def test_proximity_far_keeps_region(kansas_index):
    """Proximity far from both (east coast) keeps the score order."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(_index(kansas_index), "kansas", proximity=(-98.3, 38.5))
    assert res[0]["feature_id"] == "region.1"


def test_cell_assignments_stable(kansas_index):
    """Tile/H3/S2 assignments are deterministic and zoom-consistent."""
    from carmen_ray.geocode.engine import forward_one
    from carmen_ray.geom.tile import parse_zxy

    res = forward_one(_index(kansas_index), "kansas")
    for r in res:
        z, x, y = parse_zxy(r["cell_zxy"])
        assert 0 <= x < 2 ** z and 0 <= y < 2 ** z
        assert r["s2_cell"] > 0 and r["h3_r7"] > 0
    res2 = forward_one(_index(kansas_index), "kansas")
    assert [r["cell_zxy"] for r in res] == [r["cell_zxy"] for r in res2]


def test_bbox_filter(kansas_index):
    """options.bbox drops out-of-box results (geocode.js bbox filter)."""
    from carmen_ray.geocode.engine import forward_one

    # box around the eastern city only
    res = forward_one(_index(kansas_index), "kansas", bbox=[-76, 38, -74, 40])
    assert res and all(r["feature_id"] == "place.1" for r in res)
    # AM-crossing boxes are EINVALID in the reference (geocode.js:139
    # minX > maxX; pinned by geocode-unit.bbox.test.js)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        forward_one(_index(kansas_index), "kansas", bbox=[170, -10, -170, 10])


def test_prox_match_pre_cutoff_sort(ray_session):
    """geocode-unit.prox_match.test.js port: with a tiny spatialmatch
    stack limit, candidates from the source whose bounds contain the
    proximity point must survive the pre-cutoff sort (the reference
    carries a lazy proxMatch bit; this engine computes scoredist
    eagerly before stacking, which subsumes it — pinned here)."""
    import json as _json

    import pyarrow as pa
    import ray.data as rd

    from carmen_ray.geocode.coalesce import stack_and_coalesce
    from carmen_ray.geocode.engine import IndexData, attach_proximity, forward_one, phrasematch_query
    from carmen_ray.index.build import build_index
    from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans

    def poi(doc_id, text, lon, lat):
        return doc_id, _mk_spans([
            ("text", text, ""),
            ("geom", _json.dumps({"type": "Point", "coordinates": [lon, lat]}), ""),
            ("center", f"{lon},{lat}", ""),
            ("score", "1", ""),
        ])

    # six identical 'poi' features far away + one near Cleveland
    rows = [poi(f"poi.{i}", "poi", 0.05 * i, -0.03 * i) for i in range(6)]
    rows.append(poi("poi.9", "poi i am good", -81.74573, 41.49342))
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE)),
    })
    idx = build_index(rd.from_arrow(tbl).repartition(1))
    index = IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                      idx.layer_zooms)
    prox = (-81.74573, 41.49342)

    # end-to-end: proximity pulls the in-bounds feature to rank 0;
    # without proximity it does not win
    res = forward_one(index, "poi", proximity=prox)
    assert res[0]["feature_id"] == "poi.9"
    res_noprox = forward_one(index, "poi")
    assert res_noprox[0]["feature_id"] != "poi.9"

    # the reference's spatialmatch_stack_limit=2 case: the clamp
    # happens AFTER the scoredist sort, so poi.9's stack survives
    pms = phrasematch_query(index, ["poi"], autocomplete=True)
    attach_proximity(index, pms, prox)
    stacks = stack_and_coalesce(pms, 1, max_stacks=2)
    assert stacks, "no stacks"
    top_ids = {s.covers()[0].grid.fid for s in stacks[:2]}
    assert 9 in top_ids


def test_strictloose_full_coverage_wins(ray_session):
    """geocode-unit.strictloose.test.js port: 'albany australia' must
    resolve via the full-coverage stack (albany + country australia,
    relevance 1.0), not albany + 'western australia' (partial token
    coverage), while the province still appears in the context chain."""
    import json as _json

    import pyarrow as pa
    import ray.data as rd

    from carmen_ray.geocode.engine import IndexData, forward_one
    from carmen_ray.index.build import build_index
    from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans

    def poly(w, s, e, n):
        return {"type": "Polygon",
                "coordinates": [[[w, s], [e, s], [e, n], [w, n], [w, s]]]}

    def doc(doc_id, text, geom, center, score):
        return doc_id, _mk_spans([
            ("text", text, ""),
            ("geom", _json.dumps(geom), ""),
            ("center", f"{center[0]},{center[1]}", ""),
            ("score", str(score), ""),
        ])

    rows = [
        doc("country.1", "australia", poly(-3, -3, 3, 3), (0, 0), 100),
        doc("region.1", "western australia", poly(-2, -2, 2, 2), (0, 0), 50),
        doc("place.1", "albany", {"type": "Point", "coordinates": [0, 0]}, (0, 0), 10),
    ]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE)),
    })
    idx = build_index(rd.from_arrow(tbl).repartition(1))
    index = IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                      idx.layer_zooms)
    res = forward_one(index, "albany australia")
    assert res
    top = res[0]
    assert top["feature_id"] == "place.1"
    assert top["relevance"] == pytest.approx(1.0)
    assert top["place_name"] == "albany, western australia, australia"


def test_bbox_antimeridian_output(ray_session):
    """geocode-unit.bbox-antimeridian.test.js port: an AM-straddling
    MultiPolygon gets the narrower W>E bbox ([160,25,-65,50] for the
    USA fixture; [60,25,-130,50] for the Russia one); clip_bbox=True
    splits at ±179.9 keeping the larger side."""
    import json as _json

    import pyarrow as pa
    import ray.data as rd

    from carmen_ray.geocode.engine import IndexData, forward_one
    from carmen_ray.index.build import build_index
    from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans
    from carmen_ray.util.bbox import clip_bbox

    usa = {"type": "MultiPolygon", "coordinates": [
        [[[-140, 25], [-65, 25], [-65, 50], [-140, 50], [-140, 25]]],
        [[[160, 40], [170, 40], [170, 50], [160, 50], [160, 40]]]]}
    rus = {"type": "MultiPolygon", "coordinates": [
        [[[-140, 25], [-130, 25], [-130, 50], [-140, 50], [-140, 25]]],
        [[[60, 40], [170, 40], [170, 50], [60, 50], [60, 40]]]]}
    rows = [
        ("country.1", _mk_spans([("text", "usa", ""),
                                 ("geom", _json.dumps(usa), ""),
                                 ("center", "-100,40", ""), ("score", "1", "")])),
        ("country.2", _mk_spans([("text", "russia", ""),
                                 ("geom", _json.dumps(rus), ""),
                                 ("center", "100,45", ""), ("score", "1", "")])),
    ]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE)),
    })
    idx = build_index(rd.from_arrow(tbl).repartition(1))
    index = IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                      idx.layer_zooms)

    res = forward_one(index, "usa")
    assert res
    got = [res[0]["bbox_w"], res[0]["bbox_s"], res[0]["bbox_e"], res[0]["bbox_n"]]
    assert got == [160, 25, -65, 50]
    # clipBBox splits at ±179.9 — |W| > |E| keeps the western side
    # (bbox.js:118-124, pinned by the reference's clipBBox cases)
    assert clip_bbox(list(got)) == [-179.9, 25, -65, 50]

    res = forward_one(index, "russia")
    got = [res[0]["bbox_w"], res[0]["bbox_s"], res[0]["bbox_e"], res[0]["bbox_n"]]
    assert got == [60, 25, -130, 50]
