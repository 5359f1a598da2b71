"""Word-boundary autocomplete endings — the
geocode-unit.autocomplete-tokenized-final-term.test.js port: a trailing
separator ('dt ') or a token-replaced final term ('District' → 'dt')
only autocompletes at word boundaries, never into the middle of another
word ('dtown'). phrasematch.js:84-93 ENDING_TYPE.wordBoundaryPrefix."""

import json

import pyarrow as pa
import pytest

from carmen_ray.config import GeocoderConfig
from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans


def _poi(doc_id, text, lon, lat):
    return doc_id, _mk_spans([
        ("text", text, ""),
        ("geom", json.dumps({"type": "MultiPoint", "coordinates": [[lon, lat]]}), ""),
        ("center", f"{lon},{lat}", ""),
        ("score", "1", ""),
    ])


@pytest.fixture(scope="module")
def dt_index(ray_session):
    import ray.data as rd

    from carmen_ray.index.build import build_index

    rows = [
        _poi("poi.1", "DTOWN PARTY BUS", 0.0, 0.0),
        _poi("poi.2", "District", 1.0, 0.0),
        _poi("poi.3", "District Taco", 0.0, 1.0),
    ]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE)),
    })
    cfg = GeocoderConfig(tokens={"district": "dt"})
    return build_index(rd.from_arrow(tbl).repartition(1), config=cfg)


def _index(idx):
    from carmen_ray.geocode.engine import IndexData

    cfg = GeocoderConfig(tokens={"district": "dt"})
    return IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                     idx.layer_zooms, config=cfg)


def test_replaced_final_term_word_boundary(dt_index):
    """'District' → 'dt': exact match + whole-word autocomplete only —
    never 'dtown party bus'."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(_index(dt_index), "District")
    ids = [r["feature_id"] for r in res]
    assert ids[0] == "poi.2"
    assert "poi.3" in ids
    assert "poi.1" not in ids
    assert len(ids) == 2


def test_raw_prefix_matches_all(dt_index):
    """A raw 'dt' query is a plain prefix: all three match."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(_index(dt_index), "dt")
    assert {r["feature_id"] for r in res} == {"poi.1", "poi.2", "poi.3"}


def test_terminal_separator_word_boundary(dt_index):
    """'dt ' (and 'dt/') end in a boundary: whole-word matches only."""
    from carmen_ray.geocode.engine import forward_one

    index = _index(dt_index)
    res = forward_one(index, "dt ")
    assert {r["feature_id"] for r in res} == {"poi.2", "poi.3"}
    res_slash = forward_one(index, "dt/")
    assert [r["feature_id"] for r in res_slash] == [r["feature_id"] for r in res]


def test_no_autocomplete_exact_only(dt_index):
    """autocomplete=False: 'dt' matches only the exact 'District'."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(_index(dt_index), "dt", autocomplete=False)
    assert {r["feature_id"] for r in res} == {"poi.2"}


def test_staged_parity_word_boundary(dt_index, ray_session):
    """The staged stage computes the same ending type."""
    import ray.data as rd

    from carmen_ray.geocode.engine import forward_one
    from carmen_ray.geocode.staged import forward_geocode_staged

    cfg = GeocoderConfig(tokens={"district": "dt"})
    cases = [("q0", "District"), ("q1", "dt"), ("q2", "dt ")]
    queries = pa.table({
        "query_id": [c[0] for c in cases],
        "query": [c[1] for c in cases],
    })
    staged = forward_geocode_staged(
        rd.from_arrow(queries), dt_index, concurrency=1,
        config=cfg).to_pandas()
    index = _index(dt_index)
    for qid, q in cases:
        fused = forward_one(index, q)
        got = staged[staged["query_id"] == qid].sort_values("rank")
        assert list(got["feature_id"]) == [r["feature_id"] for r in fused], (qid, q)
