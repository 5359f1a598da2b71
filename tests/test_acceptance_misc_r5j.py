"""Round-5 tranche 10: geocode-unit.jp-order.test.js —
geocoder_address_order='descending': the ±0.01 direction refund goes
to descending matches for this source, so the native JP ordering keeps
full relevance, a Western-style ascending query drops to exactly 0.99,
and a scrambled order costs more (0.865661 through the backy walk)."""

import pytest

from acceptance_util import (_mk_spans, build_acceptance_index, multipoint,
                             point, tile_box, tile_center, tiles_poly)

C32 = tile_center(6, 32, 32)
CEN0 = f"{C32[0]},{C32[1]}"
PT0 = point(*C32)
B32 = tiles_poly(tile_box(6, 32, 32))


@pytest.fixture(scope="module")
def jp_order_index(ray_session):
    from carmen_ray.config import GeocoderConfig, LayerConfig

    cfg = GeocoderConfig(layers={
        "country": LayerConfig("country", zoom=6),
        "region": LayerConfig("region", zoom=6),
        "place": LayerConfig("place", zoom=6),
        "address": LayerConfig("address", zoom=6, geocoder_address=True,
                               geocoder_address_order="descending"),
    })
    return build_acceptance_index([
        ("country.1", _mk_spans([("text", "Japan", ""), ("geom", B32, ""),
                                 ("center", CEN0, "")])),
        ("region.2", _mk_spans([("text", "和歌山県", ""), ("geom", B32, ""),
                                ("center", CEN0, "")])),
        ("place.3", _mk_spans([("text", "岩出市", ""), ("geom", B32, ""),
                               ("center", CEN0, "")])),
        ("address.4", _mk_spans([("text", "中黒", ""),
                                 ("geom", multipoint(C32), ""),
                                 ("center", CEN0, ""),
                                 ("addr_numbers", "632", "")])),
    ], cfg)


def test_jp_order_descending_full_relevance(jp_order_index):
    """'岩出市中黒632' (fine←coarse, number last) finds the address at
    full strength (jp-order.test.js:83-89)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(jp_order_index, "岩出市中黒632", limit=1)
    assert len(res) == 1
    assert res[0]["feature_id"] == "address.4"
    assert res[0]["address"] == "632"
    assert res[0]["relevance"] == pytest.approx(1.0)


def test_jp_order_ascending_penalized(jp_order_index):
    """'632 中黒 岩出市' — Western ascending order loses the refund:
    exactly 0.99 (jp-order.test.js:91-98)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(jp_order_index, "632 中黒 岩出市", limit=1)
    assert res and res[0]["address"] == "632"
    assert res[0]["relevance"] == pytest.approx(0.99)


def test_jp_order_scrambled_costs_more(jp_order_index):
    """'632 中黒 Japan 岩出市' — mixed-up order takes the backy walk:
    0.865661 (jp-order.test.js:100-107)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(jp_order_index, "632 中黒 Japan 岩出市", limit=1)
    assert res and res[0]["address"] == "632"
    assert res[0]["relevance"] == pytest.approx(0.865661, abs=1e-6)


def test_jp_order_staged_matches_fused(ray_session):
    """The staged hydrate re-derives the direction from the shipped
    covers and moves the refund to the configured order — staged and
    fused agree on all three jp-order relevances."""
    import pyarrow as pa
    import ray.data as rd

    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import forward_geocode_ds
    from carmen_ray.geocode.staged import forward_geocode_staged
    from carmen_ray.index.build import build_index
    from carmen_ray.sources.synth import SPAN_TYPE

    cfg = GeocoderConfig(layers={
        "country": LayerConfig("country", zoom=6),
        "region": LayerConfig("region", zoom=6),
        "place": LayerConfig("place", zoom=6),
        "address": LayerConfig("address", zoom=6, geocoder_address=True,
                               geocoder_address_order="descending"),
    })
    rows = [
        ("country.1", _mk_spans([("text", "Japan", ""), ("geom", B32, ""),
                                 ("center", CEN0, "")])),
        ("region.2", _mk_spans([("text", "和歌山県", ""), ("geom", B32, ""),
                                ("center", CEN0, "")])),
        ("place.3", _mk_spans([("text", "岩出市", ""), ("geom", B32, ""),
                               ("center", CEN0, "")])),
        ("address.4", _mk_spans([("text", "中黒", ""),
                                 ("geom", multipoint(C32), ""),
                                 ("center", CEN0, ""),
                                 ("addr_numbers", "632", "")])),
    ]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows]),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE))})
    idx = build_index(rd.from_arrow(tbl).repartition(1), config=cfg)
    queries = pa.table({
        "query_id": ["q0", "q1", "q2"],
        "query": ["岩出市中黒632", "632 中黒 岩出市", "632 中黒 Japan 岩出市"]})
    fused = forward_geocode_ds(rd.from_arrow(queries), idx,
                               concurrency=1).to_pandas()
    staged = forward_geocode_staged(rd.from_arrow(queries), idx,
                                    concurrency=1).to_pandas()
    key = ["query_id", "rank"]
    f = fused.sort_values(key).reset_index(drop=True)
    s = staged.sort_values(key).reset_index(drop=True)
    assert len(f) == len(s) and len(f) >= 3
    assert (f["feature_id"] == s["feature_id"]).all()
    assert (f["relevance"] == s["relevance"]).all()
