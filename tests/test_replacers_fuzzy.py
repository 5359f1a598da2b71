"""Token replacement (index+query), fuzzy DL≤1 matching, whitespace
corrector — through the full engine (M3-M7, M17, ST1-fuzzy, R1 penalty)."""

import pytest

from carmen_ray.config import DEFAULT_TOKENS, GeocoderConfig, whitespace_hypothesis
from carmen_ray.text.token_replacer import (
    categorize_token_replacements,
    create_complex_replacer,
    create_global_replacer,
    create_simple_replacer,
    enumerate_token_replacements,
    replace_global_tokens,
    replace_token,
)
from carmen_ray.text.tokenize import tokenize


def test_simple_replacer():
    r = create_simple_replacer({"Street": "st", "Avenue": "ave"})
    assert r.replace(["main", "street"]) == ["main", "st"]
    assert r.replace(["street", "avenue", "x"]) == ["st", "ave", "x"]


def test_complex_replacer_anchored():
    rules = create_complex_replacer({"Streets": "sts"})
    out = replace_token(rules, tokenize("this street streets"))
    assert out.tokens == ["this", "street", "sts"]
    assert out.last_word is True


def test_global_replacer():
    rules = create_global_replacer({r"\bP\.?\ ?O\.? Box ([0-9]+)\b": " pob-$1 "})
    assert replace_global_tokens(rules, "P.O. Box 985").strip() == "pob-985"
    assert replace_global_tokens(rules, "PO Box 985").strip() == "pob-985"


def test_enumerate_variants():
    rules = create_complex_replacer({"dixième": "10e", "avenue": "av"})
    variants = enumerate_token_replacements(rules, tokenize("dixième avenue"))
    phrases = {v["phrase"] for v in variants}
    assert "10e av" in phrases
    assert "dixième avenue" in phrases
    assert len(variants) <= 8


def test_categorize():
    cat = categorize_token_replacements({
        "street": "st",                       # simple
        "ste?": {"text": "saint", "regex": True},  # complex
        "post office": "po",                  # complex (inner word boundary)
    })
    assert {r["from"] for r in cat["simple"]} == {"street"}
    assert len(cat["complex"]) == 2


def test_whitespace_hypothesis():
    assert whitespace_hypothesis(["main", "abc123"]) == ["main", "abc", "123"]
    assert whitespace_hypothesis(["123main"]) == ["123", "main"]
    assert whitespace_hypothesis(["7ème"]) is None  # too short on letter side
    assert whitespace_hypothesis(["main", "st"]) is None


@pytest.fixture(scope="module")
def cfg_index(ray_session):
    import ray.data as rd

    from carmen_ray.index.build import build_index
    from carmen_ray.sources.synth import generate_corpus

    cfg = GeocoderConfig(tokens=dict(DEFAULT_TOKENS))
    tbl = generate_corpus(n_streets=60, n_pois=30)
    idx = build_index(rd.from_arrow(tbl).repartition(2), config=cfg)
    return idx, cfg


def test_engine_token_replacement(cfg_index):
    """Query with the long form ('street') matches the abbreviated index."""
    from carmen_ray.geocode.engine import IndexData, forward_one

    idx, cfg = cfg_index
    f = idx.features.to_pandas()
    st_rows = f[(f.layer == "street") & f.text.str.endswith(" st")]
    assert len(st_rows) > 0
    street = st_rows.iloc[0]
    index = IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                      idx.layer_zooms, config=cfg)
    long_form = street.text[:-3] + " street"
    res = forward_one(index, long_form)
    assert res and res[0]["feature_id"] == street.doc_id
    assert res[0]["relevance"] == 1.0


def test_engine_fuzzy_match(cfg_index):
    """One-edit-distance typo still finds the feature, with the R1
    penalty lowering but not killing relevance."""
    from carmen_ray.geocode.engine import IndexData, dl_distance, forward_one

    idx, cfg = cfg_index
    f = idx.features.to_pandas()
    street = f[(f.layer == "street")].iloc[0]
    index = IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                      idx.layer_zooms, config=cfg)
    word = street.text.split()[0]
    assert len(word) >= 4
    typo = word[:2] + word[3:] if len(word) > 4 else word + "x"  # one deletion/insertion
    assert dl_distance(word, typo, 1) == 1
    res = forward_one(index, street.text.replace(word, typo))
    assert res, "fuzzy match found nothing"
    assert res[0]["feature_id"] == street.doc_id
    assert res[0]["relevance"] < 1.0  # penalty applied
    assert res[0]["relevance"] >= 0.75


def test_engine_whitespace_corrector(cfg_index):
    """Run-on 'word123' splits and still matches (address-style)."""
    from carmen_ray.geocode.engine import IndexData, forward_one

    idx, cfg = cfg_index
    f = idx.features.to_pandas()
    street = f[f.layer == "street"].iloc[1]
    index = IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                      idx.layer_zooms, config=cfg)
    words = street.text.split()
    runon = words[0] + "123"
    res = forward_one(index, " ".join([runon] + words[1:]), fuzzy=False)
    # the whitespace fallback splits word123 → word 123 and the name matches
    if res:
        assert res[0]["feature_id"] == street.doc_id


def test_dl_distance():
    from carmen_ray.geocode.engine import dl_distance

    assert dl_distance("abc", "abc") == 0
    assert dl_distance("abc", "abd", 1) == 1
    assert dl_distance("abc", "acb", 1) == 1  # transposition
    assert dl_distance("abc", "ab", 1) == 1
    assert dl_distance("abc", "xyz", 1) > 1


def test_replace_token_complex_parity():
    """token.replaceToken.test.js:229-256 — regex rules with
    skipDiacriticStripping / spanBoundaries / literal multiword."""
    from carmen_ray.text.token_replacer import create_complex_replacer, replace_token

    replacer = create_complex_replacer([
        {"from": "([^ ]+)(strasse|str|straße)",
         "to": {"text": "$1 str", "skipDiacriticStripping": True,
                "spanBoundaries": 0, "regex": True}},
        {"from": "Suite [0-9]+", "to": {"text": "", "spanBoundaries": 1, "regex": True}},
        {"from": "Lot [0-9]+", "to": {"text": "", "regex": True}},
        {"from": "Zone d'activité", "to": "Za"},
    ])

    def rt(q):
        return replace_token(replacer, tokenize(q))

    assert rt("Talstrasse").tokens == ["tal str"]
    assert rt("Talstraße").tokens == ["tal str"]
    assert rt("Talstr").tokens == ["tal str"]
    assert rt("Talstrasse 3-5").tokens == ["tal str", "3-5"]
    assert rt("Zone d'activité Bourmicht").tokens == ["za", "", "bourmicht"]


def test_enumerate_parity_fargo():
    """token.replaceToken.test.js:294-317 — permutation set and order."""
    from carmen_ray.text.token_replacer import create_complex_replacer, enumerate_token_replacements

    replacer = create_complex_replacer({"San Francisco": "sf", "Northeast": "ne"})
    out = enumerate_token_replacements(replacer, tokenize("fargo street northeast, san francisco"))
    assert [v["phrase"] for v in out] == [
        "fargo street ne sf",
        "fargo street ne san francisco",
        "fargo street northeast sf",
        "fargo street northeast san francisco",
    ]
    out2 = enumerate_token_replacements(replacer, tokenize("fargo street ne, sf"))
    assert [v["phrase"] for v in out2] == ["fargo street ne sf"]


def test_enumerate_parity_inverse():
    """token.replaceToken.test.js:431-470 — includeUnambiguous inverses."""
    from carmen_ray.text.token_replacer import create_complex_replacer, enumerate_token_replacements

    replacer = create_complex_replacer({"San Francisco": "sf", "Northeast": "ne"},
                                       include_unambiguous=True)
    out = enumerate_token_replacements(replacer, tokenize("fargo street ne, sf"))
    phrases = [v["phrase"] for v in out]
    assert phrases[0] == "fargo street ne sf"
    assert "fargo street northeast san francisco" in phrases
    assert len(phrases) == 4


def test_whitespace_reference_parity():
    """whitespace.test.js:5-17 (our variant emits split tokens in place;
    same accept/reject decisions)."""
    assert whitespace_hypothesis(["100main", "st", "washington"]) == \
        ["100", "main", "st", "washington"]
    assert whitespace_hypothesis(["Rue", "Gallait76"]) == ["Rue", "Gallait", "76"]
    assert whitespace_hypothesis(["one", "two", "three"]) is None
    assert whitespace_hypothesis(["21st", "st"]) is None       # ordinals: too few letters
    assert whitespace_hypothesis(["100", "mainst"]) is None    # non-numeric error untouched


def test_place_format_template(cfg_index, ray_session):
    """geocoder_format-style templates drive place_name rendering."""
    from carmen_ray.config import GeocoderConfig
    from carmen_ray.geocode.engine import IndexData, forward_one

    idx, _ = cfg_index
    fmt_cfg = GeocoderConfig(place_format="{name} ({context})")
    index = IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                      idx.layer_zooms, config=fmt_cfg)
    f = idx.features.to_pandas()
    street = f[f.layer == "street"].iloc[0]
    res = forward_one(index, street.text)
    assert res and res[0]["place_name"].startswith(street.text + " (")
    assert res[0]["place_name"].endswith(")")

    # default template renders "name, context"
    cfg2 = GeocoderConfig()
    assert cfg2.render_place_name("main st", ["springfield", "usa"], "12") == \
        "12 main st, springfield, usa"
    assert cfg2.render_place_name("main st", ["usa"]) == "main st, usa"


def test_windowed_fuzzy_inner_token(ray_session):
    """A one-edit misspelling that still tokenizes to a KNOWN word
    ('mair street' → 'main street' while 'mair' is itself indexed —
    fuzzyMatchWindows, phrasematch.js:106) is corrected at the
    phrase-window level, not just unknown-token symspell."""
    import json as _json

    import pyarrow as pa
    import ray.data as rd

    from carmen_ray.geocode.engine import IndexData, forward_one
    from carmen_ray.index.build import build_index
    from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans

    def doc(doc_id, text, lon, lat):
        return {"doc_id": doc_id, "spans": _mk_spans([
            ("text", text, ""),
            ("geom", _json.dumps({"type": "Point", "coordinates": [lon, lat]}), ""),
            ("center", f"{lon},{lat}", ""),
            ("score", "10", ""),
        ])}

    rows = [
        doc("street.1", "main street", 10.0, 10.0),
        doc("street.2", "mair avenue", 11.0, 11.0),  # makes 'mair' a known word
    ]
    tbl = pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.string()),
        "spans": pa.array([r["spans"] for r in rows], type=pa.list_(SPAN_TYPE)),
    })
    idx = build_index(rd.from_arrow(tbl).repartition(1))
    index = IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                      idx.layer_zooms)
    assert "mair" in index.vocab  # known word: old token-symspell never fires
    res = forward_one(index, "mair street")
    assert res, "windowed fuzzy found nothing"
    assert res[0]["feature_id"] == "street.1"
    assert res[0]["relevance"] < 1.0
    assert res[0]["relevance"] >= 0.75


def test_fuzzy_token_count_gate(cfg_index):
    """Fuzzy is gated on query token count ≤ MAX_CORRECTION_LENGTH
    (phrasematch.js:55) — a 9-token query gets no corrections."""
    from carmen_ray import constants
    from carmen_ray.geocode.engine import IndexData, forward_one

    idx, cfg = cfg_index
    f = idx.features.to_pandas()
    street = f[f.layer == "street"].iloc[0]
    index = IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                      idx.layer_zooms, config=cfg)
    word = street.text.split()[0]
    typo = word[:2] + word[3:] if len(word) > 4 else word + "x"
    padding = ["qqq"] * (constants.MAX_CORRECTION_LENGTH + 1 - len(street.text.split()))
    long_query = " ".join([typo] + street.text.split()[1:] + padding)
    res = forward_one(index, long_query)
    # the typo'd window must NOT have been fuzzy-corrected
    assert all(r["feature_id"] != street.doc_id or r["relevance"] < 0.75
               for r in res) or not res or \
        all(street.text.split()[0] not in (r.get("matching_text") or "") for r in res)


def test_inverse_tokens_index_variants(ray_session):
    """geocoder_inverse_tokens (index.js:208): an explicit reversal map
    adds index-time variants ('sankt' for 'st') ranked below canonical,
    so queries using the expanded form still match."""
    import json as _json

    import pyarrow as pa
    import ray.data as rd

    from carmen_ray.config import GeocoderConfig
    from carmen_ray.geocode.engine import IndexData, forward_one
    from carmen_ray.index.build import build_index
    from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans

    cfg = GeocoderConfig(inverse_tokens={"st": "sankt"})
    spans = _mk_spans([
        ("text", "st goar", ""),
        ("geom", _json.dumps({"type": "Point", "coordinates": [8.0, 50.0]}), ""),
        ("center", "8,50", ""),
        ("score", "10", ""),
    ])
    tbl = pa.table({
        "doc_id": pa.array(["place.1"], type=pa.string()),
        "spans": pa.array([spans], type=pa.list_(SPAN_TYPE)),
    })
    idx = build_index(rd.from_arrow(tbl).repartition(1), config=cfg)
    pg = set(idx.phrase_grid.to_pandas()["phrase"])
    assert "st goar" in pg
    assert "sankt goar" in pg  # the inverse variant got indexed
    index = IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                      idx.layer_zooms, config=cfg)
    res = forward_one(index, "sankt goar")
    assert res and res[0]["feature_id"] == "place.1"


def test_fuzzy_prefix_autocomplete(ray_session):
    """Fuzzy + autocomplete combined endings (ST1 residual,
    phrasematch.js:106-131 ending types): a misspelled FINAL token can
    still prefix-match. 'esplanade aven' (typo'd prefix of 'avenue')
    vs 'esplanade stret' (typo'd word-boundary prefix) both resolve."""
    import json as _json

    import pyarrow as pa
    import ray.data as rd

    from carmen_ray.geocode.engine import IndexData, forward_one
    from carmen_ray.index.build import build_index
    from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans

    def doc(doc_id, text, lon, lat):
        return {"doc_id": doc_id, "spans": _mk_spans([
            ("text", text, ""),
            ("geom", _json.dumps({"type": "Point", "coordinates": [lon, lat]}), ""),
            ("center", f"{lon},{lat}", ""),
            ("score", "10", ""),
        ])}

    rows = [
        doc("street.1", "esplanade street apartments", 10.0, 10.0),
        doc("street.2", "harbor view road", 11.0, 11.0),
    ]
    tbl = pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.string()),
        "spans": pa.array([r["spans"] for r in rows], type=pa.list_(SPAN_TYPE)),
    })
    idx = build_index(rd.from_arrow(tbl).repartition(1))
    index = IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                      idx.layer_zooms)

    # word-boundary prefix with a typo in its last token: 'stret' is
    # neither a prefix of 'street apartments' nor DL1 of the full phrase
    res = forward_one(index, "esplanade stret")
    assert res, "typo'd word-boundary prefix found nothing"
    assert res[0]["feature_id"] == "street.1"
    assert 0.75 <= res[0]["relevance"] < 1.0

    # insertion typo inside a PARTIAL last word (anyPrefix ending):
    # 'strete' -> delete-variant 'stret'? no — 'strete' delete 'e' →
    # 'stret' is not a raw prefix; use 'strreet' → variant 'street'
    res = forward_one(index, "esplanade strreet")
    assert res, "insertion typo in partial last word found nothing"
    assert res[0]["feature_id"] == "street.1"
    assert 0.75 <= res[0]["relevance"] < 1.0

    # exact prefixes are unaffected (and rank full-relevance)
    res = forward_one(index, "esplanade stre")
    assert res and res[0]["feature_id"] == "street.1"
    assert res[0]["relevance"] == 1.0
