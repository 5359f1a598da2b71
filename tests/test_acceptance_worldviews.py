"""Worldviews — port of
/root/reference/test/acceptance/geocode-unit.worldviews.test.js.

Two worldviews (us, cn) with worldview-split country/region sources
sharing a geocoder_name, a shared poi source, per-feature
carmen:geocoder_stack / carmen:types spans, and the full assertion set:
worldview-filtered forward + context, the stacks filter with the
context.js:44-67 worldview-override, multityped reverse, option
validation, and the constructor-time worldview config check.

Divergence note: carmen returns the context chain as separate result
features; this engine returns one feature with the chain rendered into
place_name + a context id list — the assertions pin the same membership
through that shape.
"""

import json

import pyarrow as pa
import pytest

from carmen_ray.config import GeocoderConfig, LayerConfig
from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans


def _poly(coords):
    return json.dumps({"type": "Polygon", "coordinates": [coords]})


def _pt(lon, lat):
    return json.dumps({"type": "Point", "coordinates": [lon, lat]})


# reference fixture geometries (worldviews.test.js:23-200)
CHINA_US = _poly([[70, 20], [115, 20], [115, 30], [125, 30],
                  [125, 50], [70, 50], [70, 20]])  # HK corner cut out
CHINA_CN = _poly([[70, 20], [125, 20], [125, 50], [70, 50], [70, 20]])
HONG_KONG = _poly([[115, 20], [125, 20], [125, 30], [115, 30], [115, 20]])
JAPAN = _poly([[130, 30], [145, 30], [145, 45], [130, 45], [130, 30]])
BEIJING = _poly([[115, 40], [120, 40], [120, 45], [115, 45], [115, 40]])


def _cfg(worldviews=("us", "cn")):
    stack_us = ["cn", "hk", "jp"]
    stack_cn = ["cn", "jp"]
    return GeocoderConfig(worldviews=list(worldviews), layers={
        "country_wv_us": LayerConfig(
            "country_wv_us", zoom=6, geocoder_name="country",
            geocoder_stack=stack_us, geocoder_worldview="us"),
        "country_wv_cn": LayerConfig(
            "country_wv_cn", zoom=6, geocoder_name="country",
            geocoder_stack=stack_cn, geocoder_worldview="cn"),
        "region_wv_us": LayerConfig(
            "region_wv_us", zoom=6, geocoder_name="region",
            geocoder_stack=stack_us, geocoder_worldview="us"),
        "region_wv_cn": LayerConfig(
            "region_wv_cn", zoom=6, geocoder_name="region",
            geocoder_stack=stack_cn, geocoder_worldview="cn"),
        "poi": LayerConfig("poi", zoom=14, geocoder_stack=stack_us),
    })


def _docs():
    rows = []

    def doc(doc_id, text, geom, center, score, stack, types=None):
        entries = [("text", text, ""), ("geom", geom, ""),
                   ("center", f"{center[0]},{center[1]}", ""),
                   ("score", str(score), ""), ("stack", stack, "")]
        if types:
            entries.append(("types", ",".join(types), ""))
        rows.append((doc_id, _mk_spans(entries)))

    doc("country_wv_us.1", "China", CHINA_US, (97.5, 35), 25000, "cn")
    doc("country_wv_us.2", "Hong Kong", HONG_KONG, (120, 25), 5000, "hk",
        types=["country", "region", "place"])
    doc("country_wv_cn.3", "China", CHINA_CN, (97.5, 35), 25000, "cn")
    doc("country_wv_us.4", "Japan", JAPAN, (137.5, 37.5), 25000, "jp")
    doc("country_wv_cn.4", "Japan", JAPAN, (137.5, 37.5), 25000, "jp")
    doc("region_wv_cn.52", "Hong Kong", HONG_KONG, (120, 25), 5000, "cn",
        types=["region", "place"])
    doc("region_wv_us.53", "Beijing", BEIJING, (117.5, 42.5), 5000, "cn",
        types=["region", "place"])
    doc("region_wv_cn.53", "Beijing", BEIJING, (117.5, 42.5), 5000, "cn",
        types=["region", "place"])
    doc("poi.100", "Starbucks", _pt(120, 25), (120, 25), 10, "hk")
    doc("poi.101", "Starbucks", _pt(117, 42), (117, 42), 10, "cn")
    doc("poi.102", "Starbucks", _pt(140, 40), (140, 40), 10, "jp")
    return rows


@pytest.fixture(scope="module")
def wv_index(ray_session):
    import ray.data as rd

    from carmen_ray.geocode.engine import IndexData
    from carmen_ray.index.build import build_index

    rows = _docs()
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE)),
    })
    cfg = _cfg()
    idx = build_index(rd.from_arrow(tbl).repartition(1), config=cfg)
    return IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                     idx.layer_zooms, config=cfg)


def _fwd(index, q, **kw):
    from carmen_ray.geocode.engine import forward_one

    return forward_one(index, q, **kw)


def _rev(index, lon, lat, **kw):
    from carmen_ray.geocode.engine import reverse_one

    return reverse_one(index, lon, lat, **kw)


# --- layer numbering follows config order (index.js:96-123) ------------
def test_layer_idx_from_config_order(wv_index):
    ranks = {l: wv_index.idx_rank[ix]
             for ix, l in ((int(wv_index._f["idx"][r]), l)
                           for l, rows in wv_index.layer_rows.items()
                           for r in rows[:1])}
    assert ranks["country_wv_us"] < ranks["region_wv_us"] < ranks["poi"]
    assert ranks["country_wv_cn"] < ranks["region_wv_cn"]


# --- worldviews.test.js:215-227 ----------------------------------------
def test_hong_kong_us_and_default(wv_index):
    for wv in ("us", None):
        res = _fwd(wv_index, "hong kong", worldview=wv)
        assert len(res) == 1
        assert res[0]["place_name"] == "Hong Kong"


def test_hong_kong_cn(wv_index):
    res = _fwd(wv_index, "hong kong", worldview="cn")
    assert len(res) == 1
    assert res[0]["place_name"] == "Hong Kong, China"


# --- :237-258 'hong kong china' ----------------------------------------
def test_hong_kong_china_us_no_full_relevance(wv_index):
    for wv in ("us", None):
        res = _fwd(wv_index, "hong kong china", worldview=wv)
        assert [r for r in res if r["relevance"] == 1] == []


def test_hong_kong_china_cn_full_relevance(wv_index):
    res = _fwd(wv_index, "hong kong china", worldview="cn")
    full = [r for r in res if r["relevance"] == 1]
    assert len(full) == 1
    assert full[0]["place_name"] == "Hong Kong, China"


# --- :260-284 stacks filter + worldview override ------------------------
def test_hong_kong_stack_cn_worldview_us_empty(wv_index):
    for wv in ("us", None):
        assert _fwd(wv_index, "hong kong", worldview=wv,
                    stacks=["cn"]) == []


def test_hong_kong_stack_cn_worldview_cn(wv_index):
    res = _fwd(wv_index, "hong kong", worldview="cn", stacks=["cn"])
    assert len(res) == 1
    assert res[0]["place_name"] == "Hong Kong, China"


# --- :286-300 beijing in both worldviews --------------------------------
def test_beijing_all_worldviews(wv_index):
    for wv in ("us", "cn", None):
        res = _fwd(wv_index, "beijing", worldview=wv)
        assert len(res) == 1
        assert res[0]["place_name"] == "Beijing, China"


# --- :302-371 starbucks --------------------------------------------------
def test_starbucks_all_worldviews(wv_index):
    for wv in ("us", "cn", None):
        res = _fwd(wv_index, "starbucks", worldview=wv)
        full = [r for r in res if r["relevance"] == 1]
        assert len(full) == 3
        assert all(r["place_name"].startswith("Starbucks, ") for r in full)


def test_starbucks_china_us(wv_index):
    for wv in ("us", None):
        res = _fwd(wv_index, "starbucks china", worldview=wv)
        full = [r for r in res if r["relevance"] == 1]
        assert len(full) == 1
        assert full[0]["place_name"] == "Starbucks, Beijing, China"


def test_starbucks_china_cn(wv_index):
    res = _fwd(wv_index, "starbucks china", worldview="cn")
    full = [r for r in res if r["relevance"] == 1]
    assert len(full) == 2
    assert all("China" in r["place_name"] for r in full)


def test_starbucks_stack_cn_worldview_us(wv_index):
    for wv in ("us", None):
        res = _fwd(wv_index, "starbucks china", worldview=wv, stacks=["cn"])
        full = [r for r in res if r["relevance"] == 1]
        assert len(full) == 1
        assert full[0]["place_name"] == "Starbucks, Beijing, China"


def test_starbucks_stack_cn_worldview_cn(wv_index):
    res = _fwd(wv_index, "starbucks", worldview="cn", stacks=["cn"])
    full = [r for r in res if r["relevance"] == 1]
    assert len(full) == 2
    assert all("China" in r["place_name"] for r in full)


# --- :373-392 reverse with multityped feature ---------------------------
def test_reverse_hong_kong_region_us(wv_index):
    for wv in ("us", None):
        res = _rev(wv_index, 120, 25, types=["region"], worldview=wv)
        assert len(res) == 1
        assert res[0]["place_name"] == "Hong Kong"


def test_reverse_hong_kong_region_cn(wv_index):
    res = _rev(wv_index, 120, 25, types=["region"], worldview="cn")
    assert len(res) == 1
    assert res[0]["place_name"] == "Hong Kong, China"


# --- :394-399 option validation -----------------------------------------
def test_unknown_worldview_errors(wv_index):
    with pytest.raises(ValueError, match="Worldview must be"):
        _fwd(wv_index, "china", worldview="in")
    with pytest.raises(ValueError, match="Worldview must be"):
        _rev(wv_index, 120, 25, worldview="in")


# --- :401-408 misconfigured index ----------------------------------------
def test_misconfigured_worldview_raises(ray_session):
    from carmen_ray.geocode.engine import IndexData

    bad = GeocoderConfig(worldviews=["cn"], layers={
        "country_wv_us": LayerConfig(
            "country_wv_us", zoom=6, geocoder_name="country",
            geocoder_worldview="us"),
    })
    with pytest.raises(ValueError, match="configured"):
        IndexData(None, pa.table({"phrase": pa.array([], type=pa.string())}),
                  {}, 1.0, {}, config=bad)
