"""Per-source config switches added in round 4:
geocoder_reverse_mode + reverseMode='score' (context.js:456-472, the
memo scan :217-238), geocoder_expected_number_order
(phrasematch.js:356-369), geocoder_intersection_token
(phrasematch.js:204-206) — plus staged-path intersection parity."""

from __future__ import annotations

import json

import pytest

from carmen_ray.config import GeocoderConfig, LayerConfig
from carmen_ray.sources.synth import SPAN_TYPE


def _doc(doc_id, entries):
    return doc_id, [
        {"kind": k, "text": t, "media_ref": m, "offset": i}
        for i, (k, t, m) in enumerate(entries)
    ]


def _table(rows):
    import pyarrow as pa

    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE)),
    })


@pytest.fixture(scope="module")
def reverse_built(ray_session):
    """Two POIs near a probe point: 'nearcafe' is closer but low-scored,
    'farcafe' is farther (within the 1000 m radius) but high-scored."""
    import ray.data as rd

    from carmen_ray.index.build import build_index

    pt = lambda lon, lat: json.dumps({"type": "Point", "coordinates": [lon, lat]})
    rows = [
        _doc("place.0", [
            ("text", "proberg", ""),
            ("geom", json.dumps({"type": "Polygon", "coordinates": [[
                [9.0, 9.0], [11.0, 9.0], [11.0, 11.0], [9.0, 11.0], [9.0, 9.0]]]}), ""),
            ("center", "10,10", ""), ("score", "100", ""),
        ]),
        _doc("poi.1", [("text", "nearcafe", ""), ("geom", pt(10.0005, 10.0), ""),
                       ("center", "10.0005,10", ""), ("score", "1", "")]),
        _doc("poi.2", [("text", "farcafe", ""), ("geom", pt(10.004, 10.0), ""),
                       ("center", "10.004,10", ""), ("score", "30", "")]),
    ]
    return build_index(rd.from_arrow(_table(rows)).repartition(1))


def _reverse(built, config, reverse_mode):
    from carmen_ray.geocode.engine import IndexData, reverse_one

    idx = IndexData(built.features, built.phrase_grid, built.freq,
                    built.max_score, built.layer_zooms, config=config)
    return reverse_one(idx, 10.0, 10.0, limit=1, types=["poi"],
                       reverse_mode=reverse_mode)


def test_reverse_mode_distance_default(reverse_built):
    res = _reverse(reverse_built, None, "distance")
    assert res and res[0]["feature_id"] == "poi.1"  # nearest wins


def test_reverse_mode_score(reverse_built):
    cfg = GeocoderConfig(layers={"poi": LayerConfig(
        name="poi", geocoder_reverse_mode=True)})
    res = _reverse(reverse_built, cfg, "score")
    assert res and res[0]["feature_id"] == "poi.2"  # distscore winner


def test_reverse_mode_score_requires_source_flag(reverse_built):
    """reverseMode='score' without geocoder_reverse_mode on the source
    behaves like distance mode (context.js:456 gate)."""
    res = _reverse(reverse_built, None, "score")
    assert res and res[0]["feature_id"] == "poi.1"


def test_reverse_mode_invalid_rejected(reverse_built, ray_session):
    import ray.data as rd
    import pyarrow as pa

    from carmen_ray.geocode.engine import forward_geocode_ds

    qt = pa.table({
        "query_id": ["q0"], "query": ["10,10"],
        "reverse_mode": ["sideways"],
    })
    ds = forward_geocode_ds(rd.from_arrow(qt), reverse_built, concurrency=1)
    with pytest.raises(Exception, match="not a valid reverseMode"):
        ds.count()


@pytest.fixture(scope="module")
def addr_built(ray_session):
    import ray.data as rd

    from carmen_ray.index.build import build_index

    rows = [_doc("address.0", [
        ("text", "main st", ""),
        ("geom", json.dumps({"type": "MultiPoint",
                             "coordinates": [[10.0, 10.0], [10.001, 10.0]]}), ""),
        ("center", "10,10", ""), ("score", "5", ""),
        ("addr_numbers", "3,5", ""),
    ])]
    return build_index(rd.from_arrow(_table(rows)).repartition(1))


def _addr_pms(built, config, query):
    from carmen_ray.geocode.engine import (
        IndexData,
        number_order_of,
        phrasematch_query,
    )
    from carmen_ray.text.termops import num_tokenize

    idx = IndexData(built.features, built.phrase_grid, built.freq,
                    built.max_score, built.layer_zooms, config=config)
    tokens = query.split()
    pms = []
    for var_tokens, addr in num_tokenize(tokens):
        pms += phrasematch_query(idx, var_tokens, address=addr["number"],
                                 number_order=number_order_of(var_tokens, addr))
    return pms


def test_expected_number_order_penalty(addr_built):
    """'main st 5' (number last) against a source expecting 'first'
    takes the 0.99 weight penalty; '5 main st' does not."""
    cfg = GeocoderConfig(layers={"address": LayerConfig(
        name="address", geocoder_expected_number_order="first")})
    # weight carries the subquery-length fraction (2 of 3 tokens); the
    # expected-order effect is the 0.99 ratio between the two orders
    first = max(p.weight for p in _addr_pms(addr_built, cfg, "5 main st")
                if p.subquery == "main st")
    last = max(p.weight for p in _addr_pms(addr_built, cfg, "main st 5")
               if p.subquery == "main st")
    assert last == pytest.approx(first * 0.99)


def test_expected_number_order_unset_no_penalty(addr_built):
    first = max(p.weight for p in _addr_pms(addr_built, None, "5 main st")
                if p.subquery == "main st")
    last = max(p.weight for p in _addr_pms(addr_built, None, "main st 5")
               if p.subquery == "main st")
    assert last == pytest.approx(first)


@pytest.fixture(scope="module")
def isect_built(ray_session):
    import ray.data as rd

    from carmen_ray.index.build import build_index

    line = lambda x0: json.dumps({"type": "LineString",
                                  "coordinates": [[x0, 10.0], [x0 + 0.01, 10.01]]})
    rows = [
        _doc("street.0", [("text", "elm way", ""), ("geom", line(10.0), ""),
                          ("center", "10.005,10.005", ""), ("score", "3", ""),
                          ("intersection", "birch rd", "")]),
        _doc("street.1", [("text", "birch rd", ""), ("geom", line(10.0), ""),
                          ("center", "10.005,10.005", ""), ("score", "3", "")]),
    ]
    return build_index(rd.from_arrow(_table(rows)).repartition(1))


def test_intersection_token_configurable(isect_built):
    """'birch rd corner elm way' matches the intersection phrase when a
    source sets geocoder_intersection_token='corner'; without the config
    only 'and' joins."""
    from carmen_ray.geocode.engine import IndexData, forward_one

    cfg = GeocoderConfig(layers={"street": LayerConfig(
        name="street", geocoder_intersection_token="corner")})
    idx = IndexData(isect_built.features, isect_built.phrase_grid,
                    isect_built.freq, isect_built.max_score,
                    isect_built.layer_zooms, config=cfg)
    res = forward_one(idx, "birch rd corner elm way")
    assert res and res[0]["feature_id"] == "street.0"
    assert res[0]["relevance"] >= 0.99

    idx_plain = IndexData(isect_built.features, isect_built.phrase_grid,
                          isect_built.freq, isect_built.max_score,
                          isect_built.layer_zooms)
    res_plain = forward_one(idx_plain, "birch rd corner elm way")
    hits = [r for r in res_plain
            if r["feature_id"] == "street.0" and r["relevance"] >= 0.99]
    assert not hits
    # the default token still works everywhere
    res_and = forward_one(idx_plain, "birch rd and elm way")
    assert res_and and res_and[0]["feature_id"] == "street.0"


def test_staged_intersection_parity(isect_built, ray_session):
    """The staged PhrasematchStage emits the same intersection match as
    the fused path (round-4 parity fix: staged previously skipped the
    intersection permutations entirely)."""
    import pyarrow as pa

    from carmen_ray.geocode.staged import PhrasematchStage

    st = PhrasematchStage(
        phrase_grid=isect_built.phrase_grid, freq=isect_built.freq,
        max_score=isect_built.max_score, layer_zooms=isect_built.layer_zooms,
        features=isect_built.features)
    out = st(pa.table({
        "query_id": ["q0"], "query": ["birch rd and elm way"],
    }))
    subs = out["subquery"].to_pylist()
    assert any(s.startswith("+intersection") for s in subs)
