"""Ranking fidelity: backy direction penalty, squishy score inheritance,
ghost-text dedup — the verifymatch R9/D3 behaviors, unit-level."""

import pytest

from carmen_ray.geocode.coalesce import Grid, Phrasematch, StackEntry
from carmen_ray.geocode.engine import _direction_effects


def _entry(mask, subquery, relev=0.5, idx=0):
    pm = Phrasematch(idx=idx, layer="x", zoom=6, mask=mask, weight=0.5,
                     subquery=subquery, phrase_id=0, prefix=False, grids=[])
    g = Grid(x=0, y=0, relev=relev, score=1, fid=1, tmpid=idx << 25 | 1)
    return StackEntry(pm, g, relev)


def test_direction_ascending_no_penalty():
    # "main st" (mask 3, fine) then "springfield" (mask 4, coarse):
    # ascending typed order → net 0
    covers = [_entry(0b011, "main st", 0.6, idx=3), _entry(0b100, "springfield", 0.4, idx=2)]
    assert _direction_effects(covers, 1.0) == pytest.approx(1.0)


def test_direction_descending_costs_001():
    # "springfield main st": coarse typed first → descending → −0.01
    covers = [_entry(0b110, "main st", 0.6, idx=3), _entry(0b001, "springfield", 0.4, idx=2)]
    assert _direction_effects(covers, 1.0) == pytest.approx(0.99)


def test_backy_halves_contradicting_cover():
    # three matches where the third contradicts the established direction
    covers = [
        _entry(0b001, "a", 0.4, idx=4),   # position 0 (fine)
        _entry(0b010, "b", 0.3, idx=3),   # position 1 → ascending
        _entry(0b100, "c", 0.3, idx=2),   # position 2 → consistent
    ]
    consistent = _direction_effects(covers, 1.0)
    covers_backy = [
        _entry(0b010, "a", 0.4, idx=4),   # position 1
        _entry(0b100, "b", 0.3, idx=3),   # position 2 → ascending
        _entry(0b001, "c", 0.3, idx=2),   # position 0 → contradiction
    ]
    backy = _direction_effects(covers_backy, 1.0)
    assert backy == pytest.approx(consistent - 0.5 * 0.3)


def test_single_cover_untouched():
    covers = [_entry(0b1, "a", 1.0)]
    assert _direction_effects(covers, 0.8) == 0.8


@pytest.fixture(scope="module")
def ghost_index(ray_session):
    """Corpus with a ghost poi (score<0) sharing a name with a scored poi."""
    import json

    import pyarrow as pa
    import ray.data as rd

    from carmen_ray.index.build import build_index
    from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans, generate_corpus

    tbl = generate_corpus(n_streets=20, n_pois=10)
    extra_docs = []
    # ghost twin of poi.0 (same display text, negative score, nearby)
    pois = [(d, s) for d, s in zip(tbl["doc_id"].to_pylist(), tbl["spans"].to_pylist())
            if d.startswith("poi.")]
    doc_id, spans = pois[0]
    text = next(s["text"] for s in spans if s["kind"] == "text")
    center = next(s["text"] for s in spans if s["kind"] == "center")
    lon, lat = (float(v) for v in center.split(","))
    ghost = _mk_spans([
        ("text", text, ""),
        ("geom", json.dumps({"type": "Point", "coordinates": [lon + 0.001, lat]}), ""),
        ("center", f"{lon + 0.001},{lat}", ""),
        ("score", "-1", ""),
    ])
    extra = pa.table({
        "doc_id": pa.array(["poi.900"], type=pa.string()),
        "spans": pa.array([ghost], type=pa.list_(SPAN_TYPE)),
    })
    full = pa.concat_tables([tbl, extra])
    return build_index(rd.from_arrow(full).repartition(2)), doc_id, text


def test_ghost_text_dedup(ghost_index):
    from carmen_ray.geocode.engine import IndexData, forward_one

    idx, scored_doc, text = ghost_index
    index = IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score, idx.layer_zooms)
    res = forward_one(index, text)
    ids = [r["feature_id"] for r in res]
    assert scored_doc in ids
    assert "poi.900" not in ids, "ghost with identical text must be dropped"


def test_stacks_filter(ghost_index):
    """R11: the stacks option restricts results to features inside the
    named country."""
    from carmen_ray.geocode.engine import IndexData, forward_one

    idx, scored_doc, text = ghost_index
    index = IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score, idx.layer_zooms)
    base = forward_one(index, text)
    assert base
    country = base[0]["context"][-1]
    keep = forward_one(index, text, stacks=[country])
    assert keep and all(r["context"][-1] == country or r["feature_id"] == country for r in keep)
    none = forward_one(index, text, stacks=["country.999"])
    assert none == []


def test_override_context(ray_session):
    """R10: a feature's override:{layer} text replaces the recalled
    context element of that layer in its place_name."""
    import json

    import pyarrow as pa
    import ray.data as rd

    from carmen_ray.geocode.engine import IndexData, forward_one
    from carmen_ray.index.build import build_index
    from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans

    def poly(w, s, e, n):
        return {"type": "Polygon", "coordinates": [[[w, s], [e, s], [e, n], [w, n], [w, s]]]}

    rows = [
        ("country.1", _mk_spans([
            ("text", "freedonia", ""),
            ("geom", json.dumps(poly(-10, -10, 10, 10)), ""),
            ("center", "0,0", ""), ("score", "100", "")])),
        ("region.1", _mk_spans([
            ("text", "oldname", ""),
            ("geom", json.dumps(poly(-5, -5, 5, 5)), ""),
            ("center", "0,0", ""), ("score", "50", "")])),
        ("poi.1", _mk_spans([
            ("text", "landmark", ""),
            ("geom", json.dumps({"type": "Point", "coordinates": [0.0, 0.0]}), ""),
            ("center", "0,0", ""), ("score", "10", ""),
            ("override:region", "newname", "")])),
    ]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE)),
    })
    idx = build_index(rd.from_arrow(tbl).repartition(1))
    index = IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score, idx.layer_zooms)
    res = forward_one(index, "landmark")
    assert res and res[0]["feature_id"] == "poi.1"
    assert "newname" in res[0]["place_name"]
    assert "oldname" not in res[0]["place_name"]


def test_rebalance_reference_parity():
    """spatialmatch.rebalance.test.js:29-73 — exact numeric outputs."""
    from carmen_ray.geocode.coalesce import Stack, rebalance

    def entry(weight, mask):
        return _entry(mask, "x", relev=weight)

    # no garbage: full coverage of a 6-token query
    st = Stack(entries=[entry(0.5, 7), entry(0.16666666666666666, 8),
                        entry(0.16666666666666666, 16), entry(0.16666666666666666, 32)],
               relev=1.0)
    out = rebalance(st, 6)
    assert out.relev == 0.99999999
    assert [e.relev for e in out.entries] == [0.36111111, 0.21296296, 0.21296296, 0.21296296]

    # with garbage: one query token uncovered
    st2 = Stack(entries=[entry(0.5, 7), entry(0.16666666666666666, 8),
                         entry(0.16666666666666666, 32)],
                relev=0.8333333333333333)
    out2 = rebalance(st2, 6)
    assert out2.relev == 0.78703703
    assert [e.relev for e in out2.entries] == [0.36111111, 0.21296296, 0.21296296]
