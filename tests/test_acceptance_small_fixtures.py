"""Small single-behavior acceptance ports:

- geocode-unit.lowrelev.test.js — equal-relev phrasematches are gated
  at the 0.5 relevance bar, not 0.75.
- geocode-unit.zeroscore.test.js — an index whose maxscore is 0 still
  indexes and returns its zero-score features.
- geocode-unit.name-conflict.test.js — 'Waterford Valley Canada' picks
  the neighborhood+country stack over the 19 'Canada Post Na' POIs
  (descending gappy).
- geocode-unit.dataterm.test.js — the address number is a data term:
  '1500 fake street' finds the one cluster holding 1500 among 40
  same-named clusters holding 600.
- geocode-unit.tile-edge.test.js — a feature whose center sits on a
  z14 tile edge is still found at relevance 1.
"""

import json

import pyarrow as pa
import pytest

from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans

PT0 = json.dumps({"type": "Point", "coordinates": [0, 0]})
MPT0 = json.dumps({"type": "MultiPoint", "coordinates": [[0, 0]]})


def _build(rows, cfg=None):
    import ray.data as rd

    from carmen_ray.geocode.engine import IndexData
    from carmen_ray.index.build import build_index

    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows]),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE))})
    idx = build_index(rd.from_arrow(tbl).repartition(1), config=cfg)
    return IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                     idx.layer_zooms, config=cfg)


def test_lowrelev_half_bar(ray_session):
    """geocode-unit.lowrelev.test.js: 'czech' (1 of 2 tokens of 'czech
    republic') passes the 0.5 bar; 'fake blah blah' (1 of 3) does not."""
    from carmen_ray.geocode.engine import forward_one

    ix = _build([
        ("country.1", _mk_spans([("text", "czech republic", ""),
                                 ("geom", PT0, ""), ("center", "0,0", "")])),
        ("country.2", _mk_spans([("text", "fake country two", ""),
                                 ("geom", PT0, ""), ("center", "0,0", "")])),
    ])
    res = forward_one(ix, "czech", limit=1)
    assert res[0]["feature_id"] == "country.1"
    assert res[0]["place_name"] == "czech republic"
    assert forward_one(ix, "fake blah blah", limit=1) == []


def test_zeroscore_index(ray_session):
    """geocode-unit.zeroscore.test.js: a zero-score feature in an
    all-zero-score index is indexed and returned."""
    from carmen_ray.geocode.engine import forward_one

    ix = _build([("place.1", _mk_spans([
        ("text", "Chicago", ""), ("geom", PT0, ""),
        ("center", "0,0", ""), ("score", "0", "")]))])
    res = forward_one(ix, "chicago", limit=1)
    assert len(res) == 1
    assert res[0]["feature_id"] == "place.1"
    assert res[0]["relevance"] == 1.0


def test_name_conflict_descending_gappy(ray_session):
    """geocode-unit.name-conflict.test.js: the neighborhood+country
    stack beats 19 POIs named 'Canada Post Na' for 'Waterford Valley
    Canada'."""
    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import forward_one

    rows = [
        ("country.1", _mk_spans([("text", "Canada", ""),
                                 ("geom", PT0, ""), ("center", "0,0", "")])),
        ("region.1", _mk_spans([("text", "Newfoundland and Labrador", ""),
                                ("geom", PT0, ""), ("center", "0,0", "")])),
        ("postcode.1", _mk_spans([("text", "A1N 4Y1", ""),
                                  ("geom", PT0, ""), ("center", "0,0", "")])),
        ("place.1", _mk_spans([("text", "Mount Pearl", ""),
                               ("geom", PT0, ""), ("center", "0,0", "")])),
        ("neighborhood.1", _mk_spans([("text", "Waterford Valley", ""),
                                      ("geom", PT0, ""), ("center", "0,0", "")])),
    ] + [
        (f"poi.{i}", _mk_spans([("text", f"Canada Post {i}a", ""),
                                ("geom", PT0, ""), ("center", "0,0", "")]))
        for i in range(1, 20)
    ]
    cfg = GeocoderConfig(layers={
        "country": LayerConfig("country", zoom=6),
        "region": LayerConfig("region", zoom=6),
        "postcode": LayerConfig("postcode", zoom=6),
        "place": LayerConfig("place", zoom=6),
        "neighborhood": LayerConfig("neighborhood", zoom=6),
        "poi": LayerConfig("poi", zoom=6, geocoder_name="address",
                           geocoder_types=["poi"]),
    })
    ix = _build(rows, cfg)
    res = forward_one(ix, "Waterford Valley Canada", limit=1)
    assert res[0]["feature_id"] == "neighborhood.1"
    assert res[0]["relevance"] == 1.0


def test_dataterm_address_number(ray_session):
    """geocode-unit.dataterm.test.js: 40 'fake street' clusters hold
    600; the one holding 1500 wins '1500 fake street' at relevance 1."""
    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import forward_one

    rows = [
        (f"address.{i}", _mk_spans([
            ("text", "fake street", ""), ("geom", MPT0, ""),
            ("center", "0,0", ""), ("addr_numbers", "600", "")]))
        for i in range(1, 41)
    ]
    rows.append(("address.101", _mk_spans([
        ("text", "fake street", ""), ("geom", MPT0, ""),
        ("center", "0,0", ""), ("addr_numbers", "1500", "")])))
    cfg = GeocoderConfig(layers={
        "address": LayerConfig("address", zoom=6, geocoder_address=True)})
    ix = _build(rows, cfg)
    res = forward_one(ix, "1500 fake street", limit=1)
    assert res[0]["feature_id"] == "address.101"
    assert res[0]["place_name"] == "1500 fake street"
    assert res[0]["relevance"] == 1.0


def test_tile_edge_feature_found(ray_session):
    """geocode-unit.tile-edge.test.js: center on the boundary between
    z14 tiles; the cover keeps the feature findable at relevance 1."""
    import math

    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import forward_one

    z, x, y = 14, 8093, 5301
    n = 2 ** z
    w = x / n * 360 - 180
    e = (x + 1) / n * 360 - 180
    nn = math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * y / n))))
    s = math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * (y + 1) / n))))
    poly = json.dumps({"type": "Polygon", "coordinates": [[
        [w, s], [e, s], [e, nn], [w, nn], [w, s]]]})
    ix = _build(
        [("poi.1", _mk_spans([
            ("text", "test", ""), ("geom", poly, ""),
            ("center", "-2.17405858745506,53.4619151830114", "")]))],
        GeocoderConfig(layers={"poi": LayerConfig("poi", zoom=14)}))
    res = forward_one(ix, "test", limit=1)
    assert res[0]["feature_id"] == "poi.1"
    assert res[0]["place_name"] == "test"
    assert res[0]["relevance"] == 1.0


def test_ghost_feature_stacks(ray_session):
    """geocode-unit.ghost.test.js: 'Mos Eisley Tatooine' — the scored
    neighborhood twin of a ghost (score -1) city stacks with the city
    'Tatooine' and renders its scored context chain at relevance 1."""
    import math

    from carmen_ray.geocode.engine import forward_one

    def tile_box_poly(z, x, y):
        n = 2 ** z
        w = x / n * 360 - 180
        e = (x + 1) / n * 360 - 180
        nn = math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * y / n))))
        s = math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * (y + 1) / n))))
        return json.dumps({"type": "Polygon", "coordinates": [[
            [w, s], [e, s], [e, nn], [w, nn], [w, s]]]})

    from carmen_ray.config import GeocoderConfig, LayerConfig

    box = tile_box_poly(6, 32, 32)
    ctr = "2.8125,-2.81"
    pt = json.dumps({"type": "Point", "coordinates": [2.8125, -2.81]})
    cfg = GeocoderConfig(layers={
        "region": LayerConfig("region", zoom=6),
        "city": LayerConfig("city", zoom=6),
        "neighborhood": LayerConfig("neighborhood", zoom=6),
        "poi": LayerConfig("poi", zoom=6),
    })
    ix = _build([
        ("region.1", _mk_spans([("text", "Outer Rim", ""),
                                ("geom", box, ""), ("center", ctr, "")])),
        ("city.2", _mk_spans([("text", "Mos Eisley", ""),
                              ("geom", box, ""), ("center", ctr, ""),
                              ("score", "-1", "")])),
        ("city.3", _mk_spans([("text", "Tatooine", ""),
                              ("geom", box, ""), ("center", ctr, ""),
                              ("score", "1000", "")])),
        ("neighborhood.5", _mk_spans([("text", "Mos Eisley", ""),
                                      ("geom", box, ""), ("center", ctr, ""),
                                      ("score", "10", "")])),
        ("poi.5", _mk_spans([("text", "Tatooine Community College", ""),
                             ("geom", pt, ""), ("center", ctr, "")])),
    ], cfg)
    res = forward_one(ix, "Mos Eisley Tatooine", limit=5)
    assert res and res[0]["place_name"] == "Mos Eisley, Tatooine, Outer Rim"
    assert res[0]["relevance"] == 1.0


def test_byid_queries(ray_session):
    """geocode-unit.byid.test.js: '{type}.{id}' queries return exactly
    that feature (the geocode dispatch level routes them, like
    geocode.js's byId branch)."""
    import ray.data as rd

    from carmen_ray.api import Geocoder

    rows = [
        ("country.1", _mk_spans([("text", "china", ""),
                                 ("geom", PT0, ""), ("center", "0,0", "")])),
        ("place.1", _mk_spans([("text", "chicago", ""),
                               ("geom", PT0, ""), ("center", "0,0", "")])),
    ]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows]),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE))})
    g = Geocoder.from_docs(rd.from_arrow(tbl).repartition(1))
    res = g.geocode("country.1")
    assert len(res) == 1
    assert res[0]["feature_id"] == "country.1"
    assert res[0]["place_name"] == "china"
    res = g.geocode("place.1")
    assert len(res) == 1
    assert res[0]["feature_id"] == "place.1"
    assert res[0]["place_name"] == "chicago"
