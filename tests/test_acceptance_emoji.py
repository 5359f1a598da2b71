"""Emoji handling — port of
/root/reference/test/acceptance/geocode-unit.emoji.test.js.

Emoji-only queries and emoji-only features never match; emoji embedded
in a query are stripped ('Anarres ★' finds Anarres at full relevance);
and a CJK token fused with an emoji ('南🗾') must not leave an empty
query term behind (the pre-fix engine emitted ['anarres','南',''] and
the empty term fuzzy-matched unrelated features)."""

import json

import pyarrow as pa
import pytest

from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans


@pytest.fixture(scope="module")
def emoji_index(ray_session):
    import ray.data as rd

    from carmen_ray.geocode.engine import IndexData
    from carmen_ray.index.build import build_index

    P = lambda x, y: json.dumps({"type": "Point", "coordinates": [x, y]})
    rows = [
        ("country.1", _mk_spans([("text", "☺", ""),
                                 ("geom", P(0, 0), ""), ("center", "0,0", "")])),
        ("country.2", _mk_spans([("text", "Anarres", ""),
                                 ("geom", P(10, 10), ""),
                                 ("center", "10,10", "")])),
        ("region.3", _mk_spans([("text", "whatever", ""),
                                ("geom", P(10, 10), ""),
                                ("center", "10,10", "")])),
    ]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows]),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE))})
    idx = build_index(rd.from_arrow(tbl).repartition(1))
    return IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                     idx.layer_zooms)


def test_emoji_only_queries_find_nothing(emoji_index):
    from carmen_ray.geocode.engine import forward_one

    assert forward_one(emoji_index, "☺", limit=1) == []
    assert forward_one(emoji_index, "☻", limit=1) == []


def test_query_with_emoji_strips_it(emoji_index):
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(emoji_index, "Anarres ★", limit=1)
    assert res[0]["feature_id"] == "country.2"


def test_cjk_plus_emoji_token_low_relevance(emoji_index):
    """'Anarres 南🗾': exactly one low-relevance feature, and it is the
    text match — never the unrelated region the pre-fix empty token
    fuzzy-matched. (carmen pins relevance < 0.5 through its unmatched-
    term penalty; this engine lands at the 1-of-2 weight, 0.5.)"""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(emoji_index, "Anarres 南🗾", limit=2)
    assert len(res) == 1
    assert res[0]["feature_id"] == "country.2"
    assert res[0]["relevance"] <= 0.5


def test_no_empty_tokens_from_cjk_emoji():
    from carmen_ray.geocode.engine import normalize_query
    from carmen_ray.text.tokenize import tokenize

    assert normalize_query(tokenize("Anarres 南🗾")).tokens == ["anarres", "南"]
    assert normalize_query(tokenize("☺")).tokens == []
