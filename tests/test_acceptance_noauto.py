"""Autocomplete on/off — port of
/root/reference/test/acceptance/geocode-unit.noauto.test.js.

With autocomplete, the higher-scored prefix completion wins ('abc' →
'abcde'); without it, only exact phrases match ('abc' → 'abc', 'ab' →
nothing). Mid-phrase prefixes ('place o') complete only the FINAL term;
a non-leading term alone ('one') never matches either way."""

import json

import pyarrow as pa
import pytest

from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans

PT0 = json.dumps({"type": "Point", "coordinates": [0, 0]})


def _build(rows):
    import ray.data as rd

    from carmen_ray.geocode.engine import IndexData
    from carmen_ray.index.build import build_index

    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows]),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE))})
    idx = build_index(rd.from_arrow(tbl).repartition(1))
    return IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                     idx.layer_zooms)


@pytest.fixture(scope="module")
def score_index(ray_session):
    return _build([
        ("place.1", _mk_spans([("text", "abcde", ""), ("geom", PT0, ""),
                               ("center", "0,0", ""), ("score", "100", "")])),
        ("place.2", _mk_spans([("text", "abc", ""), ("geom", PT0, ""),
                               ("center", "0,0", ""), ("score", "10", "")])),
    ])


@pytest.fixture(scope="module")
def phrase_index(ray_session):
    return _build([
        ("place.1", _mk_spans([("text", "place one", ""), ("geom", PT0, ""),
                               ("center", "0,0", ""), ("score", "100", "")])),
    ])


@pytest.mark.parametrize("query,autocomplete,want", [
    ("abc", True, "place.1"),    # higher-scored completion wins
    ("abc", False, "place.2"),   # exact phrase wins without autocomplete
    ("abcde", True, "place.1"),
    ("abcde", False, "place.1"),
    ("ab", True, "place.1"),
    ("ab", False, None),         # bare prefix matches nothing
])
def test_score_vs_autocomplete(score_index, query, autocomplete, want):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(score_index, query, limit=1,
                      autocomplete=autocomplete, fuzzy=False)
    if want is None:
        assert res == []
    else:
        assert res[0]["feature_id"] == want


@pytest.mark.parametrize("query,autocomplete,found", [
    ("place", True, True),     # first-term prefix of 'place one'
    ("place", False, False),
    ("one", True, False),      # non-leading term alone never matches
    ("one", False, False),
    ("place o", True, True),   # final-term prefix completes
    ("place o", False, False),
])
def test_tokenized_autocomplete(phrase_index, query, autocomplete, found):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(phrase_index, query, limit=1,
                      autocomplete=autocomplete, fuzzy=False)
    if found:
        assert res and res[0]["feature_id"] == "place.1"
        assert res[0]["place_name"] == "place one"
    else:
        assert res == []
