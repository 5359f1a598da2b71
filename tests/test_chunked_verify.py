"""Chunked verify with backfill + early stop (verifymatch.js:85-227,
K5): verify cost is bounded on adversarial fan-out — failed candidates
backfill from later chunks, but never below the first verified relev
tier and never past VERIFYMATCH_MAX_FEATURES_LIMIT loads."""

import json

import pyarrow as pa
import pytest

from carmen_ray import constants
from carmen_ray.geocode.coalesce import ChunkedVerifyPlanner
from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans

SL = constants.VERIFYMATCH_STACK_LIMIT          # 20
MF = constants.VERIFYMATCH_MAX_FEATURES_LIMIT   # 50


def _run(relevs, partials, oks):
    p = ChunkedVerifyPlanner(relevs, partials)
    kept = p.replay(oks)
    return p, kept


def test_all_verify_stops_at_stack_limit():
    """Happy path: the first chunk fills the stack limit; nothing beyond
    it is ever verified (same work as the old one-shot)."""
    n = 40
    p, kept = _run([1.0] * n, [False] * n, [True] * n)
    assert p.seen == SL
    assert kept == list(range(SL))


def test_backfill_on_failures():
    """Failures in chunk 1 free slots that later same-tier candidates
    backfill — the old one-shot would have missed candidate 25."""
    n = 30
    oks = [False] * n
    oks[0] = oks[25] = True
    p, kept = _run([1.0] * n, [False] * n, oks)
    assert 25 in kept
    assert p.seen > SL


def test_early_stop_blocks_lower_tier():
    """Once anything verified, backfill never dips below its relev tier:
    the 0.8 tier is never verified even though slots remain."""
    relevs = [1.0] * 25 + [0.8] * 25
    oks = [False] * 50
    oks[0] = True
    p, kept = _run(relevs, [False] * 50, oks)
    # chunk 1 = 20 @1.0; backfill chunk = the remaining 5 @1.0 only
    assert p.seen == 25
    assert kept == [0]


def test_max_features_cap():
    """With zero successes there is no early stop — the load cap bounds
    total work at VERIFYMATCH_MAX_FEATURES_LIMIT."""
    n = 80
    p, kept = _run([1.0] * n, [False] * n, [False] * n)
    assert p.seen == MF
    assert kept == []


def test_partial_number_cap_defers_not_drops():
    """Partial-number candidates beyond 80% of the stack limit defer to
    backfill (verifymatch.js:186-212) — they still verify eventually."""
    n = 30
    partials = [True] * n
    p, kept = _run([1.0] * n, partials, [True] * n)
    # cap admits cap+2 = 18 partials in chunk 1 (bug-compat >), then the
    # protocol stops as soon as stack_limit verified
    assert p.n_verified == SL
    assert len(kept) == SL


# ---------------------------------------------------------------- E2E ---


def _poi(doc_id, name, center, score):
    return doc_id, _mk_spans([
        ("text", name, ""),
        ("geom", json.dumps({"type": "Point", "coordinates": list(center)}), ""),
        ("center", f"{center[0]},{center[1]}", ""),
        ("score", str(score), ""),
    ])


def _country(doc_id, name, w, s, e, n, score):
    poly = {"type": "Polygon",
            "coordinates": [[[w, s], [e, s], [e, n], [w, n], [w, s]]]}
    return doc_id, _mk_spans([
        ("text", name, ""),
        ("geom", json.dumps(poly), ""),
        ("center", f"{(w + e) / 2},{(s + n) / 2}", ""),
        ("score", str(score), ""),
    ])


@pytest.fixture(scope="module")
def hotname_index(ray_session):
    import ray.data as rd

    from carmen_ray.index.build import build_index

    rows = [
        _country("country.1", "carthage", -10, -10, 10, 10, 500),
        _country("country.2", "utopia", 20, -10, 40, 10, 500),
    ]
    # 1 'alpha beta' in utopia with the HIGHEST score (first candidate,
    # verifies in chunk 1) + 25 identically-named carthage twins that
    # all fail the stacks filter
    rows.append(_poi("poi.us", "alpha beta", (30.0, 0.0), 999))
    for i in range(25):
        rows.append(_poi(f"poi.{i}", "alpha beta",
                         (-9 + 0.7 * i % 18, -9 + 0.6 * i % 17), 100 - i))
    # a lower-relev tier: single-token 'alpha' pois — early stop must
    # keep these from ever being verified
    for i in range(25):
        rows.append(_poi(f"poi.lo.{i}", "alpha", (20.5 + 0.7 * i, 5.0), 50))
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE)),
    })
    return build_index(rd.from_arrow(tbl).repartition(1))


def test_e2e_backfill_and_early_stop(hotname_index):
    """stacks=['utopia'] makes every carthage twin fail verification:
    the protocol backfills past the old one-shot window to find poi.us,
    while the 'alpha' tier is never verified (counter < ledger)."""
    from carmen_ray.geocode.engine import IndexData, forward_one

    idx = hotname_index
    index = IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                      idx.layer_zooms)
    stats = {}
    res = forward_one(index, "alpha beta", stacks=["utopia"], _stats=stats)
    assert [r["feature_id"] for r in res][:1] == ["poi.us"]
    # chunk 1 verifies poi.us; the backfill chunk walks the remaining
    # 'alpha beta' twins and stops at the first 'alpha'-tier candidate —
    # the one-token tier is never verified
    assert stats["candidates_verified"] <= 26
    assert stats["candidates_verified"] < stats["candidates_total"]
    assert all(not r["feature_id"].startswith("poi.lo") for r in res)


def test_e2e_stats_happy_path(hotname_index):
    """No filters: chunk 1 fills the stack limit and verification stops
    there — bounded work on a hot name."""
    from carmen_ray.geocode.engine import IndexData, forward_one

    idx = hotname_index
    index = IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                      idx.layer_zooms)
    stats = {}
    res = forward_one(index, "alpha beta", _stats=stats)
    assert res
    assert stats["candidates_verified"] == constants.VERIFYMATCH_STACK_LIMIT


def _cluster(doc_id, name, nums, base_lon, base_lat, score):
    pts = [[base_lon + 0.001 * j, base_lat] for j in range(len(nums))]
    geom = {"type": "MultiPoint", "coordinates": pts}
    return doc_id, _mk_spans([
        ("text", name, ""),
        ("geom", json.dumps(geom), ""),
        ("center", f"{pts[0][0]},{pts[0][1]}", ""),
        ("score", str(score), ""),
        ("addr_numbers", ",".join(nums), ""),
    ])


@pytest.fixture(scope="module")
def hotaddr_index(ray_session):
    import ray.data as rd

    from carmen_ray.index.build import build_index

    rows = []
    # 22 clusters with NO 7-prefix numbers, highest scores: they fill
    # chunk 1 and all fail prefix resolution for query '7'
    for i in range(22):
        rows.append(_cluster(f"address.miss.{i}", f"rue {chr(97 + i)}",
                             ["31", "52"], 2.0 + 0.01 * i, 47.0, 500 - i))
    # 4 clusters WITH a 7-prefix number, low scores: only reachable by
    # backfill rounds
    for i in range(4):
        rows.append(_cluster(f"address.hit.{i}", f"voie {chr(97 + i)}",
                             ["71", "15"], 2.5 + 0.01 * i, 47.0, 5 - i))
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
        "spans": pa.array([r[1] for r in rows], type=pa.list_(SPAN_TYPE)),
    })
    return build_index(rd.from_arrow(tbl).repartition(1))


def test_staged_parity_backfill(hotaddr_index, ray_session):
    """The staged assemble replays the protocol against verify outcomes
    (tombstones included) and lands on the fused result set exactly —
    including candidates only reachable through backfill rounds."""
    import ray.data as rd

    from carmen_ray.geocode.engine import IndexData, forward_one
    from carmen_ray.geocode.staged import forward_geocode_staged

    idx = hotaddr_index
    index = IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score,
                      idx.layer_zooms)
    prox = (2.25, 47.0)
    stats = {}
    fused = forward_one(index, "7", proximity=prox, _stats=stats)
    # the hit clusters live beyond the first chunk
    assert stats["candidates_verified"] > constants.VERIFYMATCH_STACK_LIMIT
    assert fused and all(r["feature_id"].startswith("address.hit") for r in fused)

    queries = pa.table({
        "query_id": ["q0"], "query": ["7"],
        "proximity_lon": [prox[0]], "proximity_lat": [prox[1]],
    })
    staged = forward_geocode_staged(
        rd.from_arrow(queries), idx, concurrency=1).to_pandas().sort_values("rank")
    assert len(staged) == len(fused)
    for (_, s), f in zip(staged.iterrows(), fused):
        assert s["feature_id"] == f["feature_id"]
        assert (s["address"] or None) == (f["address"] or None)
        assert s["relevance"] == pytest.approx(f["relevance"])
