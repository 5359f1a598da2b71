"""Checkpoint/lineage + resume semantics, and the multimodal plumbing."""

import json
import os

import pyarrow as pa
import pytest


def test_partition_write_resume(tmp_path):
    from carmen_ray.sources import io

    out = str(tmp_path / "t")
    os.makedirs(out)
    t1 = pa.table({"a": [1, 2], "b": ["x", "y"]})
    rec = io.write_partition(out, "00", t1)
    assert rec["rows"] == 2
    assert io.is_complete(out, "00")
    assert not io.is_complete(out, "01")
    assert io.remaining_partitions(out, ["00", "01", "02"]) == ["01", "02"]

    # manifest written and consistent
    with open(os.path.join(out, "_manifest.json")) as f:
        manifest = json.load(f)
    assert "00" in manifest["partitions"]

    # idempotent rewrite keeps the same digest
    rec2 = io.write_partition(out, "00", t1)
    assert rec2["input_digest"] == rec["input_digest"]

    back = io.read_partitions(out)
    assert back.num_rows == 2


def test_index_roundtrip_resume(tmp_path, ray_session):
    import ray.data as rd

    from carmen_ray.index.build import build_index
    from carmen_ray.sources import io
    from carmen_ray.sources.synth import generate_corpus

    tbl = generate_corpus(n_streets=30, n_pois=10)
    idx = build_index(rd.from_arrow(tbl).repartition(2))
    out = str(tmp_path / "idx")
    io.write_index(idx, out)
    # all shards committed
    parts = io.completed_partitions(out)
    assert sum(k.startswith("features-") for k in parts) == 16
    assert sum(k.startswith("phrasegrid-") for k in parts) == 16

    # resume: deleting one shard's lineage → only that shard is redone
    victim = os.path.join(out, "part=features-03", "_lineage.json")
    os.remove(victim)
    assert io.remaining_partitions(out, [f"features-{i:02d}" for i in range(16)]) == ["features-03"]
    io.write_index(idx, out, resume=True)
    assert io.is_complete(out, "features-03")

    loaded = io.load_index(out)
    assert loaded.features.num_rows == idx.features.num_rows
    assert loaded.phrase_grid.num_rows == idx.phrase_grid.num_rows
    assert loaded.max_score == idx.max_score

    # the loaded index geocodes identically
    from carmen_ray.geocode.engine import IndexData, forward_one

    f = idx.features.to_pandas()
    street = f[f.layer == "street"].iloc[0]
    a = forward_one(IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score, idx.layer_zooms), street.text)
    b = forward_one(IndexData(loaded.features, loaded.phrase_grid, loaded.freq, loaded.max_score, loaded.layer_zooms), street.text)
    assert [(r["feature_id"], r["relevance"]) for r in a] == [(r["feature_id"], r["relevance"]) for r in b]


def test_media_pipeline(ray_session):
    import ray.data as rd

    from carmen_ray.ops.multimodal import frame_sample_batch, media_feature_pipeline, fake_media_batch

    refs = pa.table({"media_ref": [f"img://x/{i}" for i in range(20)]})
    out = media_feature_pipeline(rd.from_arrow(refs), embed_dim=8, concurrency=1).to_pandas()
    assert len(out) == 20
    assert all(len(e) == 8 for e in out["embedding"])
    assert (out["mean_luma"] >= 0).all() and (out["mean_luma"] <= 255).all()
    # determinism: same ref → same features
    out2 = media_feature_pipeline(rd.from_arrow(refs), embed_dim=8, concurrency=1).to_pandas()
    m1 = out.sort_values("media_ref").reset_index(drop=True)
    m2 = out2.sort_values("media_ref").reset_index(drop=True)
    assert (m1["mean_luma"] == m2["mean_luma"]).all()


def test_frame_sample():
    from carmen_ray.ops.multimodal import fake_media_batch, frame_sample_batch

    media = fake_media_batch(["vid://1", "vid://2"], media_type="video")
    frames = frame_sample_batch(media, every_ms=5000)
    assert frames.num_rows > 0
    df = frames.to_pandas()
    assert (df.groupby("media_ref")["frame_ts_ms"].is_monotonic_increasing).all()


def test_resize_is_explicit_stub(ray_session):
    from carmen_ray.ops.multimodal import Resize, fake_media_batch

    with pytest.raises(NotImplementedError):
        Resize()(fake_media_batch(["img://a"]))


def test_streaming_build_matches_compact(tmp_path, ray_session):
    """build_index_streaming (write_parquet sinks, no driver
    materialization) produces the same index as the compact build."""
    import ray.data as rd

    from carmen_ray.geocode.engine import IndexData, forward_one
    from carmen_ray.index.build import build_index, build_index_streaming, load_index_streaming
    from carmen_ray.sources.synth import generate_corpus

    tbl = generate_corpus(n_streets=20, n_pois=5)
    compact = build_index(rd.from_arrow(tbl).repartition(2))
    out = str(tmp_path / "sidx")
    build_index_streaming(rd.from_arrow(tbl).repartition(2), out)
    loaded = load_index_streaming(out)

    assert loaded.features.num_rows == compact.features.num_rows
    assert loaded.phrase_grid.num_rows == compact.phrase_grid.num_rows
    assert loaded.max_score == compact.max_score

    f = compact.features.to_pandas()
    street = f[f.layer == "street"].iloc[0]
    a = forward_one(IndexData(compact.features, compact.phrase_grid, compact.freq,
                              compact.max_score, compact.layer_zooms), street.text)
    b = forward_one(IndexData(loaded.features, loaded.phrase_grid, loaded.freq,
                              loaded.max_score, loaded.layer_zooms), street.text)
    assert [(r["feature_id"], r["relevance"]) for r in a] == \
           [(r["feature_id"], r["relevance"]) for r in b]


def test_knn_lsh_recall(ray_session):
    """LSH-bucketed kNN recalls most of the brute-force top-10 on the
    real embeddings table (recall<1 by design; must be substantial)."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from carmen_ray.ops.similarity import knn_brute, knn_lsh_bucketed

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    qvec = np.asarray(t["embedding"].to_pylist()[0], dtype=np.float32)
    ds = rd.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    # concurrency=1: the 4-CPU test session can't host two 2-actor
    # pools plus tasks without starving the executor
    exact = set(knn_brute(ds, qvec, k=10, concurrency=1).to_pandas()["vec_id"])
    approx = set(
        knn_lsh_bucketed(
            rd.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]),
            qvec, dim=len(qvec), k=10, concurrency=1,
        ).to_pandas()["vec_id"]
    )
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_malformed_spans_survive(ray_session):
    """Malformed geom/center/score spans degrade gracefully instead of
    killing the build pipeline (100 TB inputs are never clean)."""
    import pyarrow as pa
    import ray.data as rd

    from carmen_ray.index.build import build_index
    from carmen_ray.sources.synth import SPAN_TYPE, _mk_spans, generate_corpus

    good = generate_corpus(n_streets=10, n_pois=5)
    bad = pa.table({
        "doc_id": pa.array(["poi.777", "poi.778"], type=pa.string()),
        "spans": pa.array([
            _mk_spans([("text", "broken geom", ""), ("geom", "{not json", ""),
                       ("center", "oops", ""), ("score", "NaNope", "")]),
            _mk_spans([("text", "no geom at all", "")]),
        ], type=pa.list_(SPAN_TYPE)),
    })
    idx = build_index(rd.from_arrow(pa.concat_tables([good, bad])).repartition(2))
    f = idx.features.to_pandas()
    assert "poi.777" in set(f.doc_id) and "poi.778" in set(f.doc_id)
    # degraded rows got origin fallbacks, not crashes
    row = f[f.doc_id == "poi.777"].iloc[0]
    assert row.score == 0.0


def test_read_docs_gated(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from carmen_ray.sources.io import read_docs, write_docs
    from carmen_ray.sources.synth import generate_corpus

    tbl = generate_corpus(n_streets=5, n_pois=2)
    out = str(tmp_path / "docs")
    write_docs(rd.from_arrow(tbl), out)
    back = read_docs(out)
    assert back.count() == tbl.num_rows


def test_streaming_build_resume(tmp_path, ray_session):
    """Rerunning build_index_streaming skips committed tables (marker
    files survive), and a deleted marker triggers only that table."""
    import os

    import ray.data as rd

    from carmen_ray.index.build import build_index_streaming
    from carmen_ray.sources.synth import generate_corpus

    tbl = generate_corpus(n_streets=10, n_pois=5)
    out = str(tmp_path / "residx")
    build_index_streaming(rd.from_arrow(tbl).repartition(2), out)
    marker = os.path.join(out, "phrasegrid", "_SUCCESS")
    assert os.path.exists(marker)
    mtimes = {t: os.path.getmtime(os.path.join(out, t, "_SUCCESS"))
              for t in ("features", "phrasegrid", "mediacells")}
    os.remove(marker)
    build_index_streaming(rd.from_arrow(tbl).repartition(2), out)
    assert os.path.exists(marker)
    # untouched tables kept their original markers
    assert os.path.getmtime(os.path.join(out, "features", "_SUCCESS")) == mtimes["features"]
    assert os.path.getmtime(os.path.join(out, "mediacells", "_SUCCESS")) == mtimes["mediacells"]


def test_minhash_verified_pairs(ray_session):
    """minhash_near_dups returns Jaccard-verified pairs: exact duplicates
    surface with jaccard 1.0; unrelated texts don't."""
    import pyarrow as pa
    import ray.data as rd

    from carmen_ray.ops.dedup import minhash_near_dups

    docs = pa.table({
        "doc_id": list(range(6)),
        "text": [
            "the quick brown fox jumps over the lazy dog in the morning light",
            "the quick brown fox jumps over the lazy dog in the morning light",
            "the quick brown fox jumps over the lazy dog in the evening light",
            "a completely different document about distributed query engines",
            "another unrelated text concerning spherical geometry and tiles",
            "yet another independent string with nothing shared at all here",
        ],
    })
    out = minhash_near_dups(rd.from_arrow(docs).repartition(2), threshold=0.6,
                            concurrency=1).to_pandas()
    pairs = {(a, b) for a, b in zip(out["doc_a"], out["doc_b"])}
    assert (0, 1) in pairs
    jac = out.set_index(["doc_a", "doc_b"])["jaccard"]
    assert jac.loc[(0, 1)] == 1.0
    assert (0, 2) in pairs and jac.loc[(0, 2)] >= 0.6
    assert all(a < 3 and b < 3 for a, b in pairs), "unrelated docs must not pair"


def test_empty_corpus_build(ray_session):
    """Zero-doc corpus builds an empty-but-valid index (edge hardening)."""
    import pyarrow as pa
    import ray.data as rd

    from carmen_ray.index.build import build_index
    from carmen_ray.sources.synth import SPAN_TYPE

    empty = pa.table({
        "doc_id": pa.array([], type=pa.string()),
        "spans": pa.array([], type=pa.list_(SPAN_TYPE)),
    })
    idx = build_index(rd.from_arrow(empty).repartition(1))
    assert idx.features.num_rows == 0
    assert idx.phrase_grid.num_rows == 0

    from carmen_ray.geocode.engine import IndexData, forward_one

    index = IndexData(idx.features, idx.phrase_grid, idx.freq, idx.max_score, idx.layer_zooms)
    assert forward_one(index, "anything") == []


def test_knn_ivf_recall(ray_session):
    """IVF kNN with 4/16 probes recalls most of the brute-force top-10;
    probing every cluster is exhaustive (recall 1.0)."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from carmen_ray.ops.similarity import knn_brute, knn_ivf, train_ivf_centroids

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    qvec = np.asarray(t["embedding"].to_pylist()[0], dtype=np.float32)

    def fresh():
        return rd.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])

    exact = set(knn_brute(fresh(), qvec, k=10, concurrency=1).to_pandas()["vec_id"])
    cents = train_ivf_centroids(fresh(), dim=len(qvec))
    approx = set(knn_ivf(fresh(), qvec, dim=len(qvec), k=10, n_probe=4,
                         concurrency=1, centroids=cents).to_pandas()["vec_id"])
    assert len(exact & approx) / len(exact) >= 0.5
    full = set(knn_ivf(fresh(), qvec, dim=len(qvec), k=10, n_probe=16,
                       concurrency=1, centroids=cents).to_pandas()["vec_id"])
    assert full == exact
