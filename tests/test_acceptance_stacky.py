"""Stacky bonus — port of
/root/reference/test/acceptance/geocode-unit.stacky.test.js.

Windsor CT (city in Connecticut, province synonym 'court') vs Windsor
Ct (street named 'windsor court'): for the bare query the multi-layer
city+province stack ties the street at relevance 1 and the city wins
the context sort; adding the city token ('windsor court windsor')
promotes the street to a full relevance-1 street+city stack.

Divergence note: carmen places features by carmen:zxy covers and its
context lookup is tile-based (half-open tile intervals), so its
fixtures put centers on exact tile corners. This engine derives covers
from geometry and context from PIP containment, so the port uses the
covered tiles' BOXES as geometries and interior points as centers —
the ranking semantics under test are unchanged.
"""

import json
import math

import pyarrow as pa
import pytest

from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans


def tile_box(z, x, y):
    n = 2 ** z
    lw = x / n * 360 - 180
    le = (x + 1) / n * 360 - 180
    ln_ = math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * y / n))))
    ls = math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * (y + 1) / n))))
    return lw, ls, le, ln_


def tiles_poly(*boxes):
    if len(boxes) == 1:
        w, s, e, n = boxes[0]
        return json.dumps({"type": "Polygon", "coordinates": [[
            [w, s], [e, s], [e, n], [w, n], [w, s]]]})
    return json.dumps({"type": "MultiPolygon", "coordinates": [
        [[[w, s], [e, s], [e, n], [w, n], [w, s]]] for w, s, e, n in boxes]})


@pytest.fixture(scope="module")
def stacky_index(ray_session):
    import ray.data as rd

    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import IndexData
    from carmen_ray.index.build import build_index

    b3232 = tile_box(6, 32, 32)
    b3432 = tile_box(6, 34, 32)
    rows = [
        # 'connecticut, court': the comma synonym (docs.jsonl comma form)
        ("province.1", _mk_spans([
            ("text", "connecticut", ""), ("synonym", "court", ""),
            ("geom", tiles_poly(b3232), ""), ("center", "2.8125,-2.81", "")])),
        ("city.1", _mk_spans([
            ("text", "windsor", ""),
            ("geom", tiles_poly(b3232, b3432), ""),
            ("center", "2.8125,-2.81", "")])),
        ("street.1", _mk_spans([
            ("text", "windsor court", ""),
            ("geom", tiles_poly(b3432), ""),
            ("center", "12.9375,-2.81", "")])),
    ]
    cfg = GeocoderConfig(layers={
        "province": LayerConfig("province", zoom=6),
        "city": LayerConfig("city", zoom=6),
        "street": LayerConfig("street", zoom=6, geocoder_address=True),
    })
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows]),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE))})
    idx = build_index(rd.from_arrow(tbl).repartition(1), config=cfg)
    return IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                     idx.layer_zooms, config=cfg)


def test_city_beats_street_at_context_sort(stacky_index):
    """'windsor court' (limit 2): the city+province stack ('court' via
    the province synonym) ties the street at relevance 1 and wins —
    geocode-unit.stacky.test.js:62-69."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(stacky_index, "windsor court", limit=2)
    assert res[0]["feature_id"] == "city.1"
    assert res[0]["place_name"] == "windsor, connecticut"
    assert res[0]["relevance"] == 1.0


def test_street_beats_city_when_fully_addressed(stacky_index):
    """'windsor court windsor': the street+city stack covers every
    token — street.1 at relevance 1 — stacky.test.js:71-79."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(stacky_index, "windsor court windsor", limit=2)
    assert res[0]["feature_id"] == "street.1"
    assert res[0]["place_name"] == "windsor court, windsor"
    assert res[0]["relevance"] == 1.0


def test_spatialmatch_stack_limit_option(stacky_index):
    """Per-query spatialmatch_stack_limit (geocode.js options;
    geocode-unit.spatialmatch-stack-length passes it) caps how many
    candidate stacks leave coalesce: limit 1 keeps only the best stack,
    so the street twin never verifies."""
    from carmen_ray.geocode.engine import forward_one

    full = forward_one(stacky_index, "windsor court", limit=5,
                       allow_dupes=True)
    capped = forward_one(stacky_index, "windsor court", limit=5,
                         allow_dupes=True, spatialmatch_stack_limit=1)
    assert len(full) > 1
    assert len(capped) == 1
    assert capped[0]["feature_id"] == full[0]["feature_id"]


def test_both_stacks_enumerated(stacky_index):
    """The coalesce layer itself forms both relevance-1 stacks for the
    bare query (province+city cross-layer and the street single)."""
    from carmen_ray.geocode.coalesce import stack_and_coalesce
    from carmen_ray.geocode.engine import normalize_query, phrasematch_query
    from carmen_ray.text.tokenize import tokenize

    toks = normalize_query(tokenize("windsor court")).tokens
    pms = phrasematch_query(stacky_index, toks)
    stacks = stack_and_coalesce(pms, len(toks))
    full = [tuple(sorted(e.pm.idx for e in st.entries))
            for st in stacks if st.relev == 1.0]
    assert (0, 1) in full  # province+city
    assert (2,) in full    # street alone
