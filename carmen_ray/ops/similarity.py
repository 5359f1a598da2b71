"""Similarity search over an embedding column (list<float>).

- knn_brute: cosine top-k against a broadcast query matrix — numpy
  matmul per batch (the 100 TB baseline: queries are ray.put once, every
  batch is one GEMM), per-batch partial top-k then a tiny global top-k.
- lsh buckets: random-hyperplane signatures → groupby(bucket) — the
  scale path that turns the all-pairs problem into per-bucket GEMMs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col].combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = np.asarray(arr.flatten(), dtype=np.float32)
    dim = len(flat) // batch.num_rows if batch.num_rows else 0
    return flat.reshape(batch.num_rows, dim) if batch.num_rows else flat.reshape(0, 0)


class CosineTopK:
    """Per-batch partial top-k vs a broadcast query vector (actor pool).

    The query vector ships once per actor via constructor args (Ray
    serializes constructor args into the actor, equivalent to a ray.put
    broadcast)."""

    def __init__(self, query_vec: np.ndarray, k: int, id_col: str = "vec_id", col: str = "embedding"):
        q = np.asarray(query_vec, dtype=np.float32)
        self.q = q / (np.linalg.norm(q) or 1.0)
        self.k = k
        self.id_col = id_col
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, self.col)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        sims = (m @ self.q) / norms
        k = min(self.k, len(sims))
        idx = np.argpartition(-sims, k - 1)[:k] if k else np.array([], dtype=int)
        ids = np.asarray(batch[self.id_col].to_pylist())[idx] if k else []
        return pa.table({
            self.id_col: pa.array(list(ids)),
            "cosine_sim": pa.array(np.round(sims[idx].astype(np.float64), 6)),
        })


def knn_brute(ds, query_vec, k: int = 10, id_col: str = "vec_id", col: str = "embedding",
              concurrency: int = 2):
    """Global cosine top-k: per-batch partials → global sort+limit."""
    partials = ds.map_batches(
        CosineTopK,
        fn_constructor_kwargs={"query_vec": query_vec, "k": k, "id_col": id_col, "col": col},
        batch_format="pyarrow",
        concurrency=(1, concurrency) if isinstance(concurrency, int) else concurrency,
    )
    return partials.sort(["cosine_sim", id_col], descending=[True, False]).limit(k)


class HyperplaneLSH:
    """Random-hyperplane signatures → bucket id per row (stateful:
    hyperplanes drawn once per actor from a fixed seed)."""

    def __init__(self, dim: int, bits: int = 16, seed: int = 42, col: str = "embedding"):
        rng = np.random.RandomState(seed)
        self.planes = rng.normal(size=(dim, bits)).astype(np.float32)
        self.bits = bits
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, self.col)
        proj = m @ self.planes > 0
        powers = (1 << np.arange(self.bits, dtype=np.uint64))
        bucket = (proj.astype(np.uint64) * powers[None, :]).sum(axis=1)
        return batch.append_column("lsh_bucket", pa.array(bucket, type=pa.uint64()))


def knn_lsh_bucketed(ds, query_vec, dim: int, k: int = 10, bits: int = 6,
                     id_col: str = "vec_id", col: str = "embedding",
                     concurrency: int = 2, probe_bits: int = 2):
    """Scale path: restrict the scan to the query's LSH bucket plus all
    buckets within `probe_bits` hamming flips (multi-probe LSH), then
    exact cosine inside. Recall<1 by design; the recall test pins the
    floor against knn_brute. Tune bits up / probe_bits down as the
    corpus grows (bucket occupancy ∝ n / 2^bits)."""
    q = np.asarray(query_vec, dtype=np.float32)
    hasher = HyperplaneLSH(dim=dim, bits=bits)
    q_proj = (q @ hasher.planes) > 0
    powers = (1 << np.arange(bits, dtype=np.uint64))
    q_bucket = int((q_proj.astype(np.uint64) * powers).sum())
    near_buckets = {q_bucket}
    frontier = {q_bucket}
    for _ in range(probe_bits):
        frontier = {b ^ (1 << i) for b in frontier for i in range(bits)}
        near_buckets |= frontier

    with_buckets = ds.map_batches(
        HyperplaneLSH,
        fn_constructor_kwargs={"dim": dim, "bits": bits, "col": col},
        batch_format="pyarrow",
        concurrency=(1, concurrency) if isinstance(concurrency, int) else concurrency,
    )
    filtered = with_buckets.map_batches(
        lambda b: b.filter(
            pa.compute.is_in(b["lsh_bucket"], value_set=pa.array(sorted(near_buckets), type=pa.uint64()))
        ),
        batch_format="pyarrow",
    )
    return knn_brute(filtered, query_vec, k=k, id_col=id_col, col=col,
                     concurrency=concurrency)


def pairwise_cosine_dedup(ds, threshold: float = 0.95, dim: int = 32,
                          bits: int = 10, id_col: str = "vec_id", col: str = "embedding"):
    """Embedding-cosine near-dup pairs via LSH buckets + per-bucket GEMM."""
    with_buckets = ds.map_batches(
        HyperplaneLSH,
        fn_constructor_kwargs={"dim": dim, "bits": bits, "col": col},
        batch_format="pyarrow",
        concurrency=(1, 2),
    )

    def _empty_pairs() -> pd.DataFrame:
        # typed empties: the oracle compare checks dtypes even on
        # zero-row results
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "cosine_sim": pd.Series([], dtype="float64")})

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return _empty_pairs()
        g = group.sort_values(id_col)
        ids = g[id_col].to_numpy()
        m = np.stack(g[col].to_numpy()).astype(np.float32)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        mn = m / norms[:, None]
        sims = mn @ mn.T
        ia, ib = np.triu_indices(len(ids), k=1)
        mask = sims[ia, ib] >= threshold
        return pd.DataFrame({
            "id_a": ids[ia[mask]],
            "id_b": ids[ib[mask]],
            "cosine_sim": np.round(sims[ia[mask], ib[mask]].astype(np.float64), 6),
        })

    def add_shard(b: pa.Table) -> pa.Table:
        shard = (np.asarray(b["lsh_bucket"], dtype=np.uint64) % np.uint64(16)).astype(np.int32)
        return b.append_column("shard", pa.array(shard))

    def shard_pairs(group: pd.DataFrame) -> pd.DataFrame:
        outs = [bucket_pairs(g) for _, g in group.groupby("lsh_bucket", sort=False)]
        outs = [o for o in outs if len(o)]
        if not outs:
            return _empty_pairs()
        return pd.concat(outs, ignore_index=True).drop_duplicates(["id_a", "id_b"])

    return (
        with_buckets.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(shard_pairs, batch_format="pandas")
    )


class BruteCosinePairs:
    """Exact all-pairs cosine ≥ threshold (the verification baseline for
    the LSH near-dup path): each actor loads the comparison matrix once
    from parquet in __init__ (broadcast-by-path, no driver
    materialization) and each batch is one float64 GEMM against it.
    i<j ordering by id avoids duplicates. At 100 TB this stays the
    oracle-check harness; `pairwise_cosine_dedup` is the scale path."""

    def __init__(self, parquet_path: str, threshold: float,
                 id_col: str = "vec_id", col: str = "embedding"):
        import pyarrow.parquet as _pq

        t = _pq.read_table(parquet_path, columns=[id_col, col])
        self.ids = np.asarray(t[id_col].to_pylist())
        m = np.asarray(t[col].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        self.mat = m / norms[:, None]
        self.threshold = threshold
        self.id_col = id_col
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_a = np.asarray(batch[self.id_col].to_pylist())
        m = np.asarray(batch[self.col].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        sims = (m / norms[:, None]) @ self.mat.T
        ia, ib = np.nonzero((sims >= self.threshold)
                            & (ids_a[:, None] < self.ids[None, :]))
        return pa.table({
            "id_a": pa.array(ids_a[ia]),
            "id_b": pa.array(self.ids[ib]),
            "cosine_sim": pa.array(np.round(sims[ia, ib], 6)),
        })


# ------------------------------------------------------------------ IVF ---


def train_ivf_centroids(ds, dim: int, n_clusters: int = 16, n_iter: int = 10,
                        sample_size: int = 2048, seed: int = 42,
                        col: str = "embedding") -> np.ndarray:
    """k-means coarse quantizer trained on a driver-side sample
    (sample via limit; at 100 TB swap for ds.random_sample). Lloyd
    iterations in numpy; deterministic (fixed seed, k-means++-lite
    init from the sample order)."""
    batches = []
    seen = 0
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=1024):
        batches.append(_batch_matrix(b, col))
        seen += b.num_rows
        if seen >= sample_size:
            break
    sample = np.concatenate(batches, axis=0)[:sample_size]
    norms = np.linalg.norm(sample, axis=1)
    norms[norms == 0] = 1.0
    sample = sample / norms[:, None]

    rng = np.random.RandomState(seed)
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)), replace=False)
    centroids = sample[np.sort(idx)].copy()
    for _ in range(n_iter):
        sims = sample @ centroids.T
        assign = np.argmax(sims, axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    centroids[c] = v / n
    return centroids


class IVFAssign:
    """Actor: assign each row to its nearest centroid (cluster column)."""

    def __init__(self, centroids: np.ndarray, col: str = "embedding"):
        self.centroids = np.asarray(centroids, dtype=np.float32)
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, self.col)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        assign = np.argmax((m / norms[:, None]) @ self.centroids.T, axis=1)
        return batch.append_column("ivf_cluster", pa.array(assign.astype(np.int32)))


def knn_ivf(ds, query_vec, dim: int, k: int = 10, n_clusters: int = 16,
            n_probe: int = 4, id_col: str = "vec_id", col: str = "embedding",
            concurrency: int = 2, centroids: np.ndarray | None = None):
    """IVF kNN: train/broadcast centroids → assign clusters → scan only
    the query's n_probe nearest clusters with the exact cosine kernel.
    The alternative scale path to LSH bucketing; recall grows with
    n_probe (n_probe == n_clusters ⇒ exhaustive)."""
    if centroids is None:
        centroids = train_ivf_centroids(ds, dim, n_clusters=n_clusters, col=col)
    q = np.asarray(query_vec, dtype=np.float32)
    qn = q / (np.linalg.norm(q) or 1.0)
    order = np.argsort(-(centroids @ qn))
    probe = set(int(c) for c in order[:n_probe])

    assigned = ds.map_batches(
        IVFAssign,
        fn_constructor_kwargs={"centroids": centroids, "col": col},
        batch_format="pyarrow",
        concurrency=(1, concurrency) if isinstance(concurrency, int) else concurrency,
    )
    filtered = assigned.map_batches(
        lambda b: b.filter(pa.compute.is_in(
            b["ivf_cluster"], value_set=pa.array(sorted(probe), type=pa.int32()))),
        batch_format="pyarrow",
    )
    return knn_brute(filtered, query_vec, k=k, id_col=id_col, col=col,
                     concurrency=concurrency)
