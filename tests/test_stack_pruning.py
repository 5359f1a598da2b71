"""non_overlapping_indexes pruning (index.js:325-342): a spatialmatch
stack mixing indexes whose geocoder_stacks don't intersect is never
enumerated — pruned inside coalesce.try_extend, not caught downstream."""

from __future__ import annotations

import json as _json

import pyarrow as pa
import pytest


def _doc(doc_id, text, geom, center, score):
    from carmen_ray.sources.synth import _mk_spans

    return {"doc_id": doc_id, "spans": _mk_spans([
        ("text", text, ""),
        ("geom", _json.dumps(geom), ""),
        ("center", center, ""),
        ("score", str(score), ""),
    ])}


def _build(rows):
    import ray.data as rd

    from carmen_ray.index.build import build_index
    from carmen_ray.sources.synth import SPAN_TYPE

    tbl = pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.string()),
        "spans": pa.array([r["spans"] for r in rows], type=pa.list_(SPAN_TYPE)),
    })
    return build_index(rd.from_arrow(tbl).repartition(1))


def _pt(lon, lat):
    return {"type": "Point", "coordinates": [lon, lat]}


def _poly(w, s, e, n):
    return {"type": "Polygon",
            "coordinates": [[[w, s], [e, s], [e, n], [w, n], [w, s]]]}


def test_non_overlap_from_bits():
    from carmen_ray.geocode.coalesce import non_overlap_from_bits

    # 0 = no stack configured = never pruned; disjoint bitsets prune
    # symmetrically; shared bits overlap
    m = non_overlap_from_bits({0: 0b01, 1: 0b10, 2: 0b11, 3: 0})
    assert m == {0: frozenset({1}), 1: frozenset({0})}
    assert non_overlap_from_bits({0: 0, 1: 0}) == {}


def test_try_extend_prunes_cross_stack_stacks():
    """Direct coalesce-level pin: with a disjoint non_overlap mask the
    two-cover stack is never created (not merely filtered later)."""
    from carmen_ray.geocode.coalesce import (
        Grid, Phrasematch, stack_and_coalesce)

    def pm(idx, mask, sub):
        g = Grid(x=10, y=10, relev=1.0, score=1.0, fid=1,
                 tmpid=idx * (1 << 25) + 1, scoredist=1.0)
        return Phrasematch(idx=idx, layer=f"l{idx}", zoom=6, mask=mask,
                           weight=0.5, subquery=sub, phrase_id=0,
                           prefix=False, grids=[g])

    pms = [pm(0, 0b01, "a"), pm(1, 0b10, "b")]
    free = stack_and_coalesce(pms, 2)
    assert any(len(s.entries) == 2 for s in free)

    pruned = stack_and_coalesce(
        pms, 2, non_overlap={0: frozenset({1}), 1: frozenset({0})})
    assert all(len(s.entries) == 1 for s in pruned)


def test_geocoder_stack_pruning_end_to_end(ray_session):
    """us-region + ca-street never stack; overlapping stacks do.
    Mirrors the reference's two-country fixtures
    (test/acceptance/geocode-unit.filter-sources.test.js)."""
    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import IndexData, forward_one

    rows = [
        _doc("region.1", "westdale", _poly(40, 40, 42, 42), "41,41", 50),
        _doc("street.1", "pine walk", _pt(41.0, 41.0), "41,41", 10),
    ]
    idx = _build(rows)

    def run(cfg):
        index = IndexData(idx.features, idx.phrase_grid, idx.freq,
                          idx.max_score, idx.layer_zooms, config=cfg)
        res = forward_one(index, "pine walk westdale")
        mine = [r for r in res if r["feature_id"] == "street.1"]
        return index, (mine[0]["relevance"] if mine else None)

    overlapping = GeocoderConfig(layers={
        "region": LayerConfig(name="region", geocoder_stack=["us"]),
        "street": LayerConfig(name="street", geocoder_stack=["us", "ca"]),
    })
    ix_o, rel_o = run(overlapping)
    assert ix_o.non_overlap == {}  # stacks intersect → nothing masked
    assert rel_o == pytest.approx(1.0)  # full two-cover stack formed

    disjoint = GeocoderConfig(layers={
        "region": LayerConfig(name="region", geocoder_stack=["us"]),
        "street": LayerConfig(name="street", geocoder_stack=["ca"]),
    })
    ix_d, rel_d = run(disjoint)
    assert set(ix_d.non_overlap) == set(ix_d.stack_bits)  # both masked
    # the cross-stack two-cover was never enumerated: street matches
    # alone on 2 of 3 tokens
    assert rel_d is not None and rel_d < rel_o

    # one-sided config (street has no stack) must not prune
    onesided = GeocoderConfig(layers={
        "region": LayerConfig(name="region", geocoder_stack=["us"]),
    })
    ix_s, rel_s = run(onesided)
    assert ix_s.non_overlap == {}
    assert rel_s == pytest.approx(1.0)


def test_stack_pruning_staged_parity(ray_session):
    """The staged path ships stack_bits through the PM exchange and
    prunes identically to the fused path."""
    import ray.data as rd

    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.staged import forward_geocode_staged

    rows = [
        _doc("region.1", "westdale", _poly(40, 40, 42, 42), "41,41", 50),
        _doc("street.1", "pine walk", _pt(41.0, 41.0), "41,41", 10),
    ]
    idx = _build(rows)
    queries = rd.from_items([
        {"query_id": "q0", "query": "pine walk westdale", "limit": 5,
         "proximity_lon": None, "proximity_lat": None}])

    def staged_relev(cfg):
        out = forward_geocode_staged(
            queries, index=idx, config=cfg, concurrency=1).to_pandas()
        mine = out[out["feature_id"] == "street.1"]
        return float(mine["relevance"].iloc[0]) if len(mine) else None

    disjoint = GeocoderConfig(layers={
        "region": LayerConfig(name="region", geocoder_stack=["us"]),
        "street": LayerConfig(name="street", geocoder_stack=["ca"]),
    })
    overlapping = GeocoderConfig(layers={
        "region": LayerConfig(name="region", geocoder_stack=["us"]),
        "street": LayerConfig(name="street", geocoder_stack=["us"]),
    })
    rel_over = staged_relev(overlapping)
    rel_disj = staged_relev(disjoint)
    assert rel_over == pytest.approx(1.0)
    assert rel_disj is not None and rel_disj < rel_over
