"""Language fallback (M21), strict language mode, analyze stats (A6),
cell-geometry pack (S7)."""

import pytest

from carmen_ray.text.closest_lang import closest_lang, has_language, normalize_code


def test_normalize_code():
    assert normalize_code("en-US") == "en_US"
    assert normalize_code("zh-hans") == "zh_Hans"
    assert normalize_code("SR-latn") == "sr_Latn"


def test_has_language():
    assert has_language("en")
    assert has_language("zh_Hans")
    assert has_language("pt_BR")
    assert not has_language("x")
    assert not has_language("english language")


def test_closest_lang_fallbacks():
    avail = {"default": "Germany", "de": "Deutschland", "zh": "德国"}
    assert closest_lang("de", avail) == ("de", "Deutschland")
    assert closest_lang("de_AT", avail) == ("de", "Deutschland")       # region strip
    assert closest_lang("zh_Hans", avail) == ("zh", "德国")            # matrix
    assert closest_lang("fr", avail) == ("default", "Germany")         # default
    avail2 = {"default": "x", "en_GB": "colour"}
    assert closest_lang("en", avail2)[1] == "colour"                   # base ← variant


@pytest.fixture(scope="module")
def built(ray_session):
    import ray.data as rd

    from carmen_ray.index.build import build_index
    from carmen_ray.sources.synth import generate_corpus

    tbl = generate_corpus(n_streets=30, n_pois=10)
    return build_index(rd.from_arrow(tbl).repartition(2))


def test_language_output(built):
    """Country docs carry lang:es spans; language='es' renders them."""
    from carmen_ray.geocode.engine import IndexData, forward_one

    idx = built
    f = idx.features.to_pandas()
    country = f[f.layer == "country"].iloc[0]
    index = IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score, idx.layer_zooms)
    res = forward_one(index, country.text, language="es")
    hit = next((r for r in res if r["feature_id"] == country.doc_id), None)
    assert hit is not None
    assert hit["place_name"].startswith(country.text + "o")  # es text = name+'o'
    assert hit["language"] == "es"

    # es_MX falls back to es
    res2 = forward_one(index, country.text, language="es_MX")
    hit2 = next((r for r in res2 if r["feature_id"] == country.doc_id), None)
    assert hit2 is not None and hit2["language"] == "es"


def test_language_strict_mode(built):
    """strict mode drops features without the requested language."""
    from carmen_ray.geocode.engine import IndexData, forward_one

    idx = built
    f = idx.features.to_pandas()
    street = f[f.layer == "street"].iloc[0]  # streets have no lang spans
    index = IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score, idx.layer_zooms)
    res = forward_one(index, street.text, language="es", language_mode="strict")
    assert all(r["language"] == "es" for r in res)
    assert not any(r["feature_id"] == street.doc_id for r in res)


def test_translated_query_matches(built):
    """Querying by the es translation finds the country (lang phrases
    indexed), with matching_text reporting the matched form."""
    from carmen_ray.geocode.engine import IndexData, forward_one

    idx = built
    f = idx.features.to_pandas()
    country = f[f.layer == "country"].iloc[0]
    index = IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score, idx.layer_zooms)
    res = forward_one(index, country.text + "o")  # the es form
    hit = next((r for r in res if r["feature_id"] == country.doc_id), None)
    assert hit is not None
    assert hit["matching_text"] == country.text + "o"


def test_analyze_stats(built, ray_session):
    import ray.data as rd

    from carmen_ray.index.analyze import analyze_index, duplicate_grids

    idx = built
    pg_ds = rd.from_arrow(idx.phrase_grid)
    stats = analyze_index(pg_ds).to_pandas().set_index("bucket")["n"]
    assert stats["total_grids"] == idx.phrase_grid.num_rows
    score_total = sum(stats.get(f"score_{s}", 0) for s in range(8))
    assert score_total == idx.phrase_grid.num_rows
    dupes = duplicate_grids(pg_ds).to_pandas()
    # phrase table may legitimately carry duplicate grids across langsets;
    # the checker must at least run and report deterministically
    assert "n_dupes" in dupes.columns or dupes.empty


def test_cell_geometry_pack(built, ray_session):
    import ray.data as rd

    from carmen_ray.index.analyze import cell_geometry_pack

    idx = built
    packed = cell_geometry_pack(rd.from_arrow(idx.features), zoom=8).to_pandas()
    assert packed["n_features"].sum() == idx.features.num_rows
    assert (packed["n_features"] >= 1).all()
    # every cell row carries parallel doc/geometry lists
    row = packed.iloc[0]
    assert len(row["doc_ids"]) == len(row["geometries"]) == row["n_features"]


def test_cell_pack_salting(built, ray_session):
    """Hot cells split into salted sub-partitions; union of sub-rows
    equals the unsalted pack."""
    import ray.data as rd

    from carmen_ray.index.analyze import cell_geometry_pack

    idx = built
    plain = cell_geometry_pack(rd.from_arrow(idx.features), zoom=6).to_pandas()
    salted = cell_geometry_pack(rd.from_arrow(idx.features), zoom=6,
                                salt_threshold=5, salt_factor=4).to_pandas()
    assert salted["n_features"].sum() == plain["n_features"].sum()
    # at least one hot cell actually split
    sub_counts = salted.groupby(["cell_x", "cell_y"]).size()
    assert (sub_counts > 1).any(), "no cell was salted despite Zipf skew"
    # every salted sub-partition is smaller than the hot threshold's
    # original cell
    merged = salted.groupby(["cell_x", "cell_y"])["n_features"].sum()
    plain_counts = plain.set_index(["cell_x", "cell_y"])["n_features"]
    assert (merged == plain_counts.reindex(merged.index)).all()


def test_closest_lang_reference_pins():
    """Parity pins ported from test/unit/text-processing/closest-lang.test.js."""
    from carmen_ray.text.closest_lang import closest_lang, closest_lang_label

    def value(target, avail, mode=None):
        k, v = closest_lang(target, dict(avail, default="DEFAULT"),
                            language_mode=mode)
        return v if k != "default" else None

    zh, zht = "西北部联邦管区", "西北部聯邦管區"
    assert value("en", {"en": "English", "es": "Spanish"}) == "English"
    assert value("en-XX", {"en": "English", "es": "Spanish"}) == "English"
    assert value("zh", {"zh": zh, "zh_Hant": zht}) == zh
    assert value("zh-xx", {"zh": zh, "zh_Hant": zht}) == zh
    for t in ("zh-hant", "zh_hant", "zh-Hant", "zh_Hant", "zh-HANT", "zh_HANT"):
        assert value(t, {"zh": zh, "zh_Hant": zht}) == zht
    # Arabic fallback
    assert value("ar", {"en": "English"}) == "English"
    # null translations are invisible
    assert value("zh-TW", {"zh": "帝力縣", "zh_TW": None}) == "帝力縣"
    # universal
    assert value("en", {"universal": "10000"}) == "10000"
    assert value("zh", {"universal": "10000"}) == "10000"
    # strict-mode Serbian matrix
    sr, sr_latn, sr_cyrl, hr, bs = "sr", "sr_Latn", "sr_Cyrl", "hr", "bs"
    strict = "strict"
    for t in ("sr-BA", "sr-CS", "sr-ME", "sr-RS", "sr-XX"):
        got = closest_lang_label(t, [sr, sr_latn, sr_cyrl], strict)
        assert got == sr_latn, (t, got)
    assert closest_lang_label("sr-RS", [sr, sr_cyrl, hr, bs], strict) == hr
    assert closest_lang_label("sr-RS", [sr, sr_cyrl, bs], strict) == bs
    assert closest_lang_label("sr-XX", [sr, sr_cyrl, hr, bs], strict) is None
    assert closest_lang_label("sr-Latn", [sr], strict) is None
    # garbage with hyphens
    assert closest_lang_label("xx-YY", ["en"]) is None
