"""Planted near-duplicate fixtures: every dedup operator must find
exactly the pairs we plant (the sf embeddings are random vectors, so
the 0-row query output alone is untested evidence — VERDICT r1 #10).

Reference behavior model: near-dup mining as in standard MinHash/LSH
and SimHash literature (SURVEY.md §LLM-ops)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _ds(df):
    import ray.data as rd

    return rd.from_pandas(df)


BASE_TEXTS = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "machine learning systems require careful data curation and cleaning",
    "geospatial indexes partition the world into hierarchical cells",
    "streaming execution with backpressure keeps memory bounded",
    "tokenization splits text into normalized lowercase terms",
]


@pytest.fixture(scope="module")
def planted_docs():
    rng = np.random.RandomState(7)
    rows = []
    for i in range(40):
        words = [f"w{rng.randint(0, 5000)}" for _ in range(30)]
        rows.append({"doc_id": i, "text": " ".join(words)})
    # plant 5 near-dup pairs: copy with one word changed (high jaccard)
    for j, base in enumerate(BASE_TEXTS):
        a_id, b_id = 100 + 2 * j, 101 + 2 * j
        rows.append({"doc_id": a_id, "text": base * 3})
        rows.append({"doc_id": b_id, "text": (base * 3).replace("the", "teh", 1)})
    return pd.DataFrame(rows)


EXPECTED_PAIRS = {(100 + 2 * j, 101 + 2 * j) for j in range(5)}


def test_minhash_near_dups_finds_planted(ray_session, planted_docs):
    from carmen_ray.ops.dedup import minhash_near_dups

    out = minhash_near_dups(_ds(planted_docs), threshold=0.7).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(out["doc_a"], out["doc_b"])}
    assert EXPECTED_PAIRS <= got
    # nothing random should pass the 0.7 jaccard verify
    assert got == EXPECTED_PAIRS
    assert (out["jaccard"] >= 0.7).all()


def test_simhash_near_dups_finds_planted(ray_session, planted_docs):
    """4-segment pigeonhole blocking guarantees recall only for
    hamming ≤ 3; planted pair j=2 lands at hamming 7 and is out of
    contract (checked explicitly)."""
    from carmen_ray.ops.dedup import simhash_near_dups

    out = simhash_near_dups(_ds(planted_docs), max_hamming=3).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(out["doc_a"], out["doc_b"])}
    within_contract = EXPECTED_PAIRS - {(104, 105)}
    assert within_contract <= got
    assert (out["hamming"] <= 3).all()


def test_embedding_dedup_finds_planted(ray_session):
    from carmen_ray.ops.similarity import pairwise_cosine_dedup

    rng = np.random.RandomState(11)
    dim = 32
    base = rng.normal(size=(60, dim)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(60)]
    expected = set()
    for j in range(5):
        a_id, b_id = 200 + 2 * j, 201 + 2 * j
        v = base[j] / np.linalg.norm(base[j])
        noise = rng.normal(size=dim).astype(np.float32) * 0.005
        rows.append({"vec_id": a_id, "embedding": v.tolist()})
        rows.append({"vec_id": b_id, "embedding": (v + noise).tolist()})
        expected.add((a_id, b_id))
    out = pairwise_cosine_dedup(_ds(pd.DataFrame(rows)), threshold=0.99, dim=dim).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(out["id_a"], out["id_b"])}
    # LSH bucketing: planted near-identical pairs must co-bucket and be found
    assert expected <= got
    assert (out["cosine_sim"] >= 0.99).all()


def test_exact_dedup_counts(ray_session):
    from carmen_ray.ops.dedup import exact_dedup

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["same  text", "Same TEXT", "unique one", "same text", "unique two"],
    })
    out = exact_dedup(_ds(df)).to_pandas()
    assert len(out) == 3
    trio = out[out["dup_count"] == 3]
    assert len(trio) == 1 and int(trio["doc_id"].iloc[0]) == 1
