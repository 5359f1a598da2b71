"""Staged (sharded scale path) vs fused forward pipeline equivalence,
and reverse multi-result (J5)."""

import pyarrow as pa
import pytest

from carmen_ray.sources.synth import generate_corpus


@pytest.fixture(scope="module")
def built(ray_session):
    import ray.data as rd

    from carmen_ray.index.build import build_index

    tbl = generate_corpus(n_streets=40, n_pois=20)
    return build_index(rd.from_arrow(tbl).repartition(2))


def test_staged_matches_fused(built, ray_session):
    import ray.data as rd

    from carmen_ray.geocode.engine import forward_geocode_ds
    from carmen_ray.geocode.staged import forward_geocode_staged

    idx = built
    f = idx.features.to_pandas()
    texts = f[f.layer.isin(["street", "poi", "place"])]["text"].head(25).tolist()
    queries = pa.table({"query_id": [f"q{i}" for i in range(len(texts))], "query": texts})

    fused = forward_geocode_ds(rd.from_arrow(queries), idx, concurrency=1).to_pandas()
    staged = forward_geocode_staged(rd.from_arrow(queries), idx, concurrency=1).to_pandas()

    cols = ["feature_id", "relevance", "matching_text"]
    top_f = fused[fused["rank"] == 0].set_index("query_id")[cols]
    top_s = staged[staged["rank"] == 0].set_index("query_id")[cols]
    assert set(top_f.index) == set(top_s.index)
    joined = top_f.join(top_s, lsuffix="_f", rsuffix="_s")
    assert (joined["feature_id_f"] == joined["feature_id_s"]).all()
    assert (joined["relevance_f"] == joined["relevance_s"]).all()
    mt_f = joined["matching_text_f"].fillna("")
    mt_s = joined["matching_text_s"].fillna("")
    assert (mt_f == mt_s).all()


def test_phrase_sharded_stage_covers_all(built, ray_session):
    """A PhrasematchStage holding only shard k of N emits a subset; the
    union over shards equals the unsharded output (the fan-out contract)."""
    from carmen_ray.geocode.staged import PhrasematchStage

    idx = built
    f = idx.features.to_pandas()
    text = f[f.layer == "street"].iloc[0].text
    queries = pa.table({"query_id": ["q0"], "query": [text]})

    kwargs = dict(features=idx.features, phrase_grid=idx.phrase_grid, freq=idx.freq,
                  max_score=idx.max_score, layer_zooms=idx.layer_zooms)
    full = PhrasematchStage(**kwargs)(queries)
    parts = [PhrasematchStage(**kwargs, shard=k, of_n=4)(queries) for k in range(4)]
    n_parts = sum(p.num_rows for p in parts)
    assert n_parts == full.num_rows


def test_reverse_multi(built, ray_session):
    from carmen_ray.geocode.engine import IndexData, reverse_one

    idx = built
    index = IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score, idx.layer_zooms)
    f = idx.features.to_pandas()
    poi = f[f.layer == "poi"].iloc[0]
    res = reverse_one(index, float(poi.center_lon), float(poi.center_lat),
                      limit=3, types=["poi"])
    assert 1 <= len(res) <= 3
    assert res[0]["feature_id"] == poi.doc_id
    # ranked by distance-adjusted score, ranks sequential
    assert [r["rank"] for r in res] == list(range(len(res)))
    assert all(r["feature_id"].startswith("poi.") for r in res)


def test_staged_matches_fused_proximity_and_shards(built, ray_session):
    """Parity extension (VERDICT r1 item 2): proximity queries through
    the staged path — with the phrase table sharded 3-ways — must rank
    identically to the fused actor (same top feature + relevance; the
    staged max_score now rides along in the PM rows instead of the old
    1000.0 hardcode, so scoredist ordering matches)."""
    import ray.data as rd

    from carmen_ray.geocode.engine import forward_geocode_ds
    from carmen_ray.geocode.staged import forward_geocode_staged

    idx = built
    f = idx.features.to_pandas()
    targets = f[f.layer.isin(["street", "poi", "place"])].head(20)
    queries = pa.table({
        "query_id": [f"q{i}" for i in range(len(targets))],
        "query": targets["text"].tolist(),
        # proximity biased to a DIFFERENT feature's location (reversed
        # order) so the proximity term actually reorders candidates
        "proximity_lon": targets["center_lon"].tolist()[::-1],
        "proximity_lat": targets["center_lat"].tolist()[::-1],
    })

    fused = forward_geocode_ds(rd.from_arrow(queries), idx, concurrency=1).to_pandas()
    staged = forward_geocode_staged(
        rd.from_arrow(queries), idx, concurrency=1, phrase_shards=3
    ).to_pandas()

    top_f = fused[fused["rank"] == 0].set_index("query_id")[["feature_id", "relevance"]]
    top_s = staged[staged["rank"] == 0].set_index("query_id")[["feature_id", "relevance"]]
    assert set(top_f.index) == set(top_s.index)
    joined = top_f.join(top_s, lsuffix="_f", rsuffix="_s")
    assert (joined["feature_id_f"] == joined["feature_id_s"]).all()
    assert (joined["relevance_f"] == joined["relevance_s"]).all()


@pytest.fixture(scope="module")
def built_dir(ray_session, tmp_path_factory):
    """Streaming-built partitioned-parquet index (the index_dir mode)."""
    import ray.data as rd

    from carmen_ray.index.build import build_index_streaming

    tbl = generate_corpus(n_streets=40, n_pois=20)
    out = str(tmp_path_factory.mktemp("idx") / "index")
    build_index_streaming(rd.from_arrow(tbl).repartition(2), out)
    return out


def test_staged_index_dir_matches_fused(built_dir, ray_session):
    """Fully de-broadcast mode: every actor loads its own shard from the
    partitioned parquet layout (PhrasematchStage pshard slices,
    VerifyHydrate fshard slices) — results identical to the fused
    whole-index actor on the same corpus."""
    import ray.data as rd

    from carmen_ray.geocode.engine import forward_geocode_ds
    from carmen_ray.geocode.staged import forward_geocode_staged
    from carmen_ray.index.build import load_index_streaming

    idx = load_index_streaming(built_dir)
    f = idx.features.to_pandas()
    targets = f[f.layer.isin(["street", "poi", "place"])].head(25)
    queries = pa.table({
        "query_id": [f"q{i}" for i in range(len(targets))],
        "query": targets["text"].tolist(),
        "proximity_lon": targets["center_lon"].tolist()[::-1],
        "proximity_lat": targets["center_lat"].tolist()[::-1],
    })

    fused = forward_geocode_ds(rd.from_arrow(queries), idx, concurrency=1).to_pandas()
    staged = forward_geocode_staged(
        rd.from_arrow(queries), index_dir=built_dir, concurrency=2,
        phrase_shards=2, verify_shards=2,
    ).to_pandas()

    cols = ["feature_id", "relevance", "matching_text", "place_name"]
    top_f = fused[fused["rank"] == 0].set_index("query_id")[cols].sort_index()
    top_s = staged[staged["rank"] == 0].set_index("query_id")[cols].sort_index()
    assert set(top_f.index) == set(top_s.index)
    joined = top_f.join(top_s, lsuffix="_f", rsuffix="_s")
    for c in cols:
        lhs = joined[f"{c}_f"]
        rhs = joined[f"{c}_s"]
        if lhs.dtype == object:
            lhs, rhs = lhs.fillna(""), rhs.fillna("")
        assert (lhs == rhs).all(), c
    # full result-set size parity, not just rank 0
    assert len(fused) == len(staged)


def test_verify_hydrate_lazy_shards_cover_all(built_dir, ray_session):
    """VerifyHydrate's lazily-bound fshard slices partition the feature
    table disjointly and cover it, and the resident-shard LRU bound
    holds while every vshard is visited."""
    from carmen_ray import constants
    from carmen_ray.geocode.staged import VerifyHydrate
    from carmen_ray.index.build import read_feature_shard

    vh = VerifyHydrate(index_dir=built_dir)
    seen: set = set()
    total = 0
    for v in range(constants.FSHARD_MOD):
        vh._bind_shard(v)
        ids = set(vh.index.doc_index)
        assert not (seen & ids)
        seen |= ids
        total += vh.index.n_features
        assert len(vh._shards) <= VerifyHydrate._MAX_RESIDENT_SHARDS
    n_full = read_feature_shard(built_dir).num_rows
    assert total == n_full > 0


def test_phrasematch_stage_features_free(built_dir, ray_session):
    """PhrasematchStage's IndexData holds no feature store (the
    de-broadcast contract)."""
    from carmen_ray.geocode.staged import PhrasematchStage

    st = PhrasematchStage(index_dir=built_dir, shard=0, of_n=2)
    assert st.index._f is None
    assert st.index.n_features == 0
    assert st.index.idx_rank  # dense ranks came from index_meta.json


def test_pm_prune_parity(built, ray_session, monkeypatch):
    """GRAFT_PM_PRUNE=1 moves stack_and_coalesce's per-pm grid caps
    (nearby-only partial filter + best-MAX_GRIDS_PER_PM cut) into
    PhrasematchStage, before the exchange. The candidate stream must be
    bit-identical either way — pinned under a tiny cap so the >cap
    branch actually fires on this corpus, and with proximity queries so
    the scoredist ordering (shared grid_prox_arrays) is exercised."""
    from carmen_ray.geocode import coalesce as coalesce_mod
    from carmen_ray.geocode.staged import PhrasematchStage, add_qshard, coalesce_shard

    idx = built
    f = idx.features.to_pandas()
    t = f[f.layer.isin(["street", "poi", "place"])].head(30)
    queries = pa.table({
        "query_id": [f"q{i}" for i in range(len(t))],
        "query": t["text"].tolist(),
        # half the queries proximity-biased at their own feature
        "proximity_lon": [float(r) if i % 2 else None
                          for i, r in enumerate(t["center_lon"])],
        "proximity_lat": [float(r) if i % 2 else None
                          for i, r in enumerate(t["center_lat"])],
    })
    kwargs = dict(features=idx.features, phrase_grid=idx.phrase_grid,
                  freq=idx.freq, max_score=idx.max_score,
                  layer_zooms=idx.layer_zooms)

    monkeypatch.setattr(coalesce_mod, "MAX_GRIDS_PER_PM", 3)

    def cands(prune: str):
        monkeypatch.setenv("GRAFT_PM_PRUNE", prune)
        pm = PhrasematchStage(**kwargs)(queries)
        if "__qshard" not in pm.column_names:
            pm = add_qshard(pm)
        out = coalesce_shard(pm).to_pandas()
        return out.sort_values(["query_id", "si"]).reset_index(drop=True)

    off, on = cands("0"), cands("1")
    assert len(off) == len(on) > 0
    import numpy as np
    for c in off.columns:
        a, b = off[c].to_numpy(), on[c].to_numpy()
        if a.dtype == object and len(a) and isinstance(a[0], np.ndarray):
            assert all(np.array_equal(x, y) for x, y in zip(a, b)), c
        else:
            assert off[c].equals(on[c]), c
