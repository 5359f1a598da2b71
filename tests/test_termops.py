"""Parity with /root/reference/test/unit/text-processing termops suites:
numTokenV3, getWeights, getIndexablePhrases, parseSemiNumber,
getHousenumRangeV3, logScale3Bit, numTokenize(Prefix)."""

import math

from carmen_ray.text.termops import (
    address,
    decode_3bit_log,
    encode_3bit_log,
    get_housenum_range,
    get_indexable_phrases,
    get_weights,
    num_token_v3,
    num_tokenize,
    num_tokenize_prefix,
    parse_semi_number,
)


def test_num_token_v3():
    assert num_token_v3("") == ""
    assert num_token_v3("1") == "#"
    assert num_token_v3("12") == "##"
    assert num_token_v3("123") == "1##"
    assert num_token_v3("1234") == "12##"
    assert num_token_v3("12345") == "12###"
    assert num_token_v3("123456") == "12####"
    assert num_token_v3("1234567") == "12#####"
    assert num_token_v3("12345678") == "12######"


def test_parse_semi_number():
    assert parse_semi_number("9") == 9
    assert parse_semi_number("9th") == 9
    assert parse_semi_number("10a") == 10
    assert parse_semi_number("4к2") == 4
    assert parse_semi_number("foo") is None


def test_address():
    assert address("10") == "10"
    assert address("10a") == "10a"
    assert address("10-19") == "10-19"
    assert address("6n23") == "6n23"
    assert address("w350n5337") == "w350n5337"
    assert address("4к2") == "4к2"
    assert address("main") is None


def test_get_weights():
    freq = {"__COUNT__": 1002, "a": 1000, "b": 1, "c": 1}
    res = get_weights(["a", "b", "c"], freq)
    assert res == [0.047820577394264194, 0.47608971130286787, 0.47608971130286787]
    assert math.isclose(sum(res), 1.0)

    res = get_weights(["###", "a", "b", "c"], freq)
    assert res == [0.2, 0.038256461915411356, 0.3808717690422943, 0.3808717690422943]

    res = get_weights(["a", "b", "c", "###"], freq)
    assert res == [0.038256461915411356, 0.3808717690422943, 0.3808717690422943, 0.2]

    res = get_weights(["+intersection", "a", "b", ",", "c"], freq)
    assert res == [
        0.2438760012475654,
        0.024495995009738453,
        0.2438760012475654,
        0.2438760012475654,
        0.2438760012475654,
    ]


def test_get_indexable_phrases_basic():
    freq = {"__COUNT__": 101, "main": 1, "st": 100}
    phrases = get_indexable_phrases(["main", "st"], freq, text_hash=0)
    assert [(p.relev, p.phrase, p.hash) for p in phrases] == [
        (1, "main st", 0),
        (0.8, "main", 0),
    ]


def test_get_indexable_phrases_reduce_relevance():
    freq = {"__COUNT__": 101, "4": 1, "st": 1, "nw": 1}
    phrases = get_indexable_phrases(["4", "st", "nw"], freq, text_hash=0, reduce_relevance=True)
    assert [(p.relev, p.phrase) for p in phrases] == [(0.8, "4 st nw")]


def test_get_indexable_phrases_frequent_words():
    freq = {"__COUNT__": 10}
    phrases = get_indexable_phrases(["main", "st", "nw"], freq, frequent_words={"st", "nw"}, text_hash=0)
    assert [(p.relev, p.phrase) for p in phrases] == [
        (1, "main st nw"),
        (0.8, "main st"),
        (0.8, "main nw"),
    ]


def test_get_indexable_phrases_weight_sieve():
    freq = {"__COUNT__": 202, "jose": 1, "de": 100, "la": 100, "casa": 1}
    phrases = get_indexable_phrases(["jose", "de", "la", "casa"], freq, text_hash=0)
    fmt = lambda r: str(int(r)) if r == int(r) else str(r)  # JS number printing
    assert [f"{fmt(p.relev)}-1-{p.phrase}" for p in phrases] == [
        "1-1-jose de la casa",
        "1-1-jose de casa",
        "1-1-jose la casa",
        "0.8-1-jose casa",
    ]


def test_get_indexable_phrases_single_tokens():
    for tok in ("京都市", "москва"):
        phrases = get_indexable_phrases([tok], {"__COUNT__": 1, tok: 1}, text_hash=0)
        assert [(p.relev, p.phrase)for p in phrases] == [(1, tok)]


def test_housenum_range():
    # addressnumber form
    assert get_housenum_range(addressnumbers=[["9", "10", "7"]]) == ["#", "##"]
    assert get_housenum_range(addressnumbers=[["2000", "2002", "2004"]]) == ["20##"]
    assert get_housenum_range() is None
    # range form min..max stepping 10/100
    r = get_housenum_range(range_props=[(["0"], ["100"])])
    assert r == ["#", "##", "1##"]


def test_3bit_log_scale():
    assert encode_3bit_log(0, 100) == 0
    assert encode_3bit_log(1, 100) == 1
    assert encode_3bit_log(100, 100) == 7
    for n in (2, 5, 10, 50, 99):
        e = encode_3bit_log(n, 100)
        assert 1 <= e <= 7
        d = decode_3bit_log(e, 100)
        assert d >= 1
    assert decode_3bit_log(7, 100) == 100
    assert decode_3bit_log(0, 100) == 0


def test_num_tokenize():
    variants = num_tokenize(["main", "123"])
    assert len(variants) == 1
    tokens, addr = variants[0]
    assert tokens == ["main", "1##"]
    assert addr == {"number": "123", "position": 1}
    assert num_tokenize(["main", "st"]) == []


def test_num_tokenize_prefix():
    # "19" could waffle as ## (19), 1# (190) — the unchanged "19" (1900) is excluded
    out = num_tokenize_prefix(["19"])
    flat = [v[0] for v in out]
    assert flat == ["##", "1#"]
    assert num_tokenize_prefix(["main"]) == []
    assert num_tokenize_prefix(["19", "x"]) == []


def test_outlier_fences():
    """A7 — indexdocs getNonOutlierBounds: the 5000 outlier in
    [9,10,11,100,5000] is fenced out (the FIXTURES.md clamp case)."""
    from carmen_ray.index.standardize import clamp_range, non_outlier_bounds

    # a realistic cluster: 20 in-range numbers + one 5000 outlier (the
    # percentile fences need enough mass to isolate the tail)
    cluster = [str(2 * i + 1) for i in range(20)] + ["5000"]
    bounds = non_outlier_bounds([cluster])
    lower_limit, lower_bound, upper_limit, upper_bound, n_out = bounds
    assert n_out >= 1
    assert upper_bound is not None and upper_bound < 5000
    lo, hi = clamp_range(1, 5000, bounds)
    assert hi <= upper_bound
    # clean clusters pass through untouched
    clean = non_outlier_bounds([["1", "3", "5", "7", "9"]])
    assert clean[4] == 0
    assert clamp_range(1, 9, clean) == (1, 9)


def test_permutations_continuous_parity():
    """termops.permutations.test.js:10-38 — exact continuous-window
    enumeration order."""
    from carmen_ray.text.termops import permutations

    def toks(terms, **kw):
        return [p.tokens for p in permutations(terms, **kw)]

    assert toks(["a", "b", "c", "d"]) == [
        ["a", "b", "c", "d"],
        ["a", "b", "c"], ["b", "c", "d"],
        ["a", "b"], ["b", "c"], ["c", "d"],
        ["a"], ["b"], ["c"], ["d"],
    ]
    assert toks(["a", "b", "c"]) == [
        ["a", "b", "c"], ["a", "b"], ["b", "c"], ["a"], ["b"], ["c"],
    ]
    assert toks(["a", "b"]) == [["a", "b"], ["a"], ["b"]]
    assert toks(["a"]) == [["a"]]


def test_permutations_address_swap_parity():
    """termops.permutations.test.js:39-63 — trailing/middle numToken
    swaps to the leading position."""
    from carmen_ray.text.termops import permutations

    def toks(terms, pos):
        return [p.tokens for p in permutations(
            terms, address_position=pos, address_number="200")]

    assert toks(["2##", "b", "c"], 0) == [
        ["2##", "b", "c"], ["2##", "b"], ["b", "c"], ["2##"], ["b"], ["c"],
    ]
    assert toks(["a", "b", "2##"], 2) == [
        ["2##", "a", "b"], ["a", "b"], ["2##", "b"], ["a"], ["b"], ["2##"],
    ]
    assert toks(["a", "2##", "c"], 1) == [
        ["a", "2##", "c"], ["2##", "a"], ["2##", "c"], ["a"], ["2##"], ["c"],
    ]


def test_permutations_props_parity():
    """termops.permutations.test.js:66-80 — ender/relev/mask."""
    from carmen_ray.text.termops import permutations

    perms = permutations(["a", "b", "c", "d"], [0.1, 0.1, 0.2, 0.6])
    assert perms[0].tokens == ["a", "b", "c", "d"]
    assert perms[0].ender is True
    assert perms[0].relev == 1
    assert bin(perms[0].mask) == "0b1111"
    assert perms[1].tokens == ["a", "b", "c"]
    assert perms[1].ender is False
    assert perms[1].relev == 0.4
    assert bin(perms[1].mask) == "0b111"
    assert perms[2].tokens == ["b", "c", "d"]


def test_housenum_range_reference_parity():
    """termops.getHousenumRangeV3.test.js:5-50 — exact waffle sets."""
    assert get_housenum_range() is None
    assert get_housenum_range(addressnumbers=[]) is None
    assert get_housenum_range(addressnumbers=[[0, 10]]) == ["#", "##"]
    assert get_housenum_range(addressnumbers=[[0, 10000000000]]) == ["#", "10#########"]
    assert get_housenum_range(addressnumbers=[[5, 10, 1, 13, 3100, 3101, 3503]]) == \
        ["#", "##", "31##", "35##"]
    assert get_housenum_range(addressnumbers=[["5a", "10b", "1c", "13d"]]) == ["#", "##"]
    assert get_housenum_range(addressnumbers=[["lot 1", "lot 10"]]) == ["#", "##"]
    assert get_housenum_range(addressnumbers=[["apt a", "apt b"]]) is None
    # tiger range: lfrom/lto pairs zip per member
    assert get_housenum_range(range_props=[(["0", "11"], ["5", "100"])]) == ["#", "##", "1##"]


def test_3bit_log_scale_reference_parity():
    """termops.logScale3Bit.test.js — exact encode/decode values (fround
    float32 semantics included)."""
    assert encode_3bit_log(3566, 180000) == 5
    assert encode_3bit_log(-1, 10) == 0
    assert encode_3bit_log(0, 10) == 0
    expected = {1: 1, 2: 3, 3: 4, 4: 5, 5: 5, 6: 6, 7: 6, 8: 7, 9: 7, 10: 7}
    for n, want in expected.items():
        assert encode_3bit_log(n, 10) == want, n
    assert decode_3bit_log(5, 180000, True) == 5672
    dec = {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 7, 7: 10}
    for n, want in dec.items():
        assert decode_3bit_log(n, 10, True) == want, n
    assert decode_3bit_log(6.5, 1.01) == 1.0092824097422461


def test_frequent_word_list_relevance_floor(ray_session):
    """geocoder_frequent_word_list (index.js:217-222): a permutation
    that drops a listed word still gets indexed (floored at the 0.8
    relevance bucket, termops.js:668-672) instead of being discarded."""
    import json as _json

    import pyarrow as pa
    import ray.data as rd

    from carmen_ray.config import GeocoderConfig
    from carmen_ray.geocode.engine import IndexData, forward_one
    from carmen_ray.index.build import build_index
    from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans

    spans = _mk_spans([
        ("text", "the grand arcade", ""),
        ("geom", _json.dumps({"type": "Point", "coordinates": [9.0, 9.0]}), ""),
        ("center", "9,9", ""),
        ("score", "10", ""),
    ])
    tbl = pa.table({
        "doc_id": pa.array(["poi.5"], type=pa.string()),
        "spans": pa.array([spans], type=pa.list_(SPAN_TYPE)),
    })
    # without the list, dropping "the" sinks below the 0.8 floor and the
    # phrase is NOT indexed at all
    idx0 = build_index(rd.from_arrow(tbl).repartition(1))
    assert "grand arcade" not in set(idx0.phrase_grid.to_pandas()["phrase"])

    cfg = GeocoderConfig(frequent_word_list=["the"])
    idx = build_index(rd.from_arrow(tbl).repartition(1), config=cfg)
    pg = idx.phrase_grid.to_pandas().set_index("phrase")
    assert "grand arcade" in pg.index
    # the-dropped phrase keeps the reference's ≥0.8 relevance floor
    assert float(pg.loc["grand arcade", "relev"]) >= 0.8
    index = IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                      idx.layer_zooms, config=cfg)
    res = forward_one(index, "grand arcade")
    assert res and res[0]["feature_id"] == "poi.5"
    assert res[0]["relevance"] >= 0.8
