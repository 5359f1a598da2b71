"""Partial-number proximity acceptance — the
geocode-unit.address-partial-number.js port: a bare all-digit query
becomes an address-prefix hypothesis ONLY when the proximity point is
inside the source's bounds (proxMatch, phrasematch.js:47,207), resolves
by cluster prefix (addresscluster.js forwardPrefix/forwardPrefixFiltered),
never interpolates, and only counts grids near the proximity point
(carmen-core nearby_only)."""

import json

import pyarrow as pa
import pytest

from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans


def _cluster_doc(doc_id, text, nums, pts, center, score=5):
    geom = {"type": "MultiPoint", "coordinates": pts}
    return doc_id, _mk_spans([
        ("text", text, ""),
        ("geom", json.dumps(geom), ""),
        ("center", f"{center[0]},{center[1]}", ""),
        ("score", str(score), ""),
        ("addr_numbers", ",".join(nums), ""),
    ])


@pytest.fixture(scope="module")
def pn_index(ray_session):
    import ray.data as rd

    from carmen_ray.index.build import build_index

    # fr-style cluster (reference fixture's number set, trimmed) near
    # (2.74, 47.97); us cluster '742 evergreen terrace' at (-121, 40);
    # a TIGER ITP street that must never match a bare-number query.
    fr_nums = ["9", "35", "71", "100", "504", "735", "737", "740", "753", "5000"]
    fr_pts = [[2.734 + 0.001 * i, 47.975 + 0.0004 * i] for i in range(len(fr_nums))]
    us_nums = ["742"]
    us_pts = [[-121.0, 40.0]]
    itp = {"type": "MultiLineString", "coordinates": [[[-120.0, 45.0], [-120.0, 46.0]]]}
    rows = [
        _cluster_doc("address.1", "rue de saint firmin", fr_nums, fr_pts,
                     (2.7389, 47.9766)),
        _cluster_doc("address.2", "evergreen terrace", us_nums, us_pts, (-121.0, 40.0)),
        ("address.3", _mk_spans([
            ("text", "main st", ""),
            ("geom", json.dumps(itp), ""),
            ("center", "-120.0,45.5", ""),
            ("score", "5", ""),
            ("addr_range", json.dumps({
                "lfromhn": [["1"]], "ltohn": [["99"]],
                "rfromhn": [["2"]], "rtohn": [["100"]],
                "parityl": [["O"]], "parityr": [["E"]],
            }), ""),
        ])),
    ]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE)),
    })
    return build_index(rd.from_arrow(tbl).repartition(1))


def _index(idx):
    from carmen_ray.geocode.engine import IndexData

    return IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                     idx.layer_zooms)


def test_in_index_prox_fr(pn_index):
    """'7' near the fr cluster → that cluster, address prefix '7'."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(_index(pn_index), "7", proximity=(2.73737, 47.977057))
    assert res, "expected a partial-number result"
    assert res[0]["feature_id"] == "address.1"
    assert res[0]["address"] is not None and res[0]["address"].startswith("7")
    # never the far-away us cluster (nearby_only radius)
    assert all(r["feature_id"] != "address.2" for r in res)


def test_in_index_prox_us(pn_index):
    """'7' near the us cluster → 742 evergreen terrace."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(_index(pn_index), "7", proximity=(-121.0, 40.0))
    assert res
    assert res[0]["feature_id"] == "address.2"
    assert res[0]["address"] == "742"


def test_out_of_index_prox(pn_index):
    """Proximity far outside every source's bounds → the bare-number
    hypothesis is never generated."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(_index(pn_index), "7", proximity=(-50.0, -50.0))
    assert res == []


def test_no_proximity_no_partial(pn_index):
    """No proximity at all → no partial-number interpretation."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(_index(pn_index), "7")
    assert res == []


def test_no_matching_prefix(pn_index):
    """'76' near the fr cluster: no house number starts with 76 →
    the feature is dropped at verify (forwardPrefix returns nothing)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(_index(pn_index), "76", proximity=(2.73737, 47.977057))
    assert all(r["feature_id"] != "address.1" or r["address"] is None for r in res)


def test_itp_never_partial_matches(pn_index):
    """Bare '1' near the ITP street: prefix queries never interpolate
    (verifymatch.js:404-416)."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(_index(pn_index), "1", proximity=(-120.0, 45.5))
    assert all(r["feature_id"] != "address.3" for r in res)


def test_full_number_still_exact(pn_index):
    """Sanity: the normal multi-token address path is untouched."""
    from carmen_ray.geocode.engine import forward_one

    res = forward_one(_index(pn_index), "735 rue de saint firmin")
    assert res and res[0]["feature_id"] == "address.1"
    assert res[0]["address"] == "735"


def test_coalesce_radius_knob(pn_index):
    """geocoder_coalesce_radius (indexer/index.js:233) replaces the
    zoom-scaled radius inside the coalesce-stage scoredist."""
    from carmen_ray.config import GeocoderConfig, LayerConfig
    from carmen_ray.geocode.engine import IndexData, forward_one

    idx = pn_index

    def run(radius):
        cfg = GeocoderConfig(layers={
            "address": LayerConfig(name="address", geocoder_address=True,
                                   geocoder_coalesce_radius=radius)})
        index = IndexData(idx.features, idx.phrase_grid, idx.freq,
                          idx.max_score, idx.layer_zooms, config=cfg)
        res = forward_one(index, "735 rue de saint firmin",
                          proximity=(2.73737, 47.977057))
        assert res and res[0]["feature_id"] == "address.1"
        return res[0]["scoredist"]

    # a sub-mile radius makes the gaussian decay bite at this distance;
    # the default (zoom-scaled, hundreds of miles) does not
    assert run(0.05) < run(None)
    """The staged path generates, gates and resolves the partial-number
    hypothesis identically to the fused path."""
    import ray.data as rd

    from carmen_ray.geocode.engine import forward_one
    from carmen_ray.geocode.staged import forward_geocode_staged

    cases = [
        ("q_fr", "7", 2.73737, 47.977057),
        ("q_us", "7", -121.0, 40.0),
        ("q_out", "7", -50.0, -50.0),
    ]
    queries = pa.table({
        "query_id": [c[0] for c in cases],
        "query": [c[1] for c in cases],
        "proximity_lon": [c[2] for c in cases],
        "proximity_lat": [c[3] for c in cases],
    })
    staged = forward_geocode_staged(
        rd.from_arrow(queries), pn_index, concurrency=1).to_pandas()
    index = _index(pn_index)
    for qid, q, lo, la in cases:
        fused = forward_one(index, q, proximity=(lo, la))
        got = staged[staged["query_id"] == qid].sort_values("rank")
        assert len(got) == len(fused), (qid, len(got), len(fused))
        for (_, s), f in zip(got.iterrows(), fused):
            assert s["feature_id"] == f["feature_id"], qid
            assert (s["address"] or None) == (f["address"] or None), qid
            assert s["relevance"] == pytest.approx(f["relevance"]), qid
