"""Deduplication operators for a documents table.

Scale-first designs:
- exact:   content-hash in a vectorized map_batches, then
           groupby(hash) + first-wins — one shuffle of (hash, doc_id)
           pairs only (text never moves).
- minhash: shingle→minhash per batch (numpy), explode to
           (band, band_hash, doc_id) rows, groupby bands → candidate
           pairs → verified Jaccard. At 100 TB every stage is a
           narrow-column shuffle; signatures are 128·4 bytes/doc.
- simhash: 64-bit simhash per batch; near-dups = hamming ≤ k via
           4-segment pigeonhole blocking (exact-match groupby per
           segment), no O(n²).
- ngram:   character n-gram Jaccard verify kernel (used by both).
- embedding: cosine near-dup via LSH random-hyperplane bucketing; the
           verify matmul is per-bucket numpy.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

_WS = re.compile(r"\s+")


def _normalize(t: str) -> str:
    return " ".join(_WS.split(t.lower())).strip() if t else ""


# ------------------------------------------------------------- exact ---

def add_content_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    from ..util.hashing import fnv1a_64

    hashes = np.fromiter(
        (fnv1a_64(_normalize(t)) for t in batch[text_col].to_pylist()),
        dtype=np.uint64, count=batch.num_rows,
    )
    return batch.append_column("content_hash", pa.array(hashes, type=pa.uint64()))


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id", shards: int = 64):
    """Exact dedup: keep the min-id row per normalized-text hash.

    Returns a Dataset of (content_hash, doc_id, dup_count). Only the
    narrow (hash, id) projection shuffles. The shuffle key is a coarse
    shard of the hash (`shards` groups) so the per-group Python overhead
    is O(shards); the exact per-hash grouping is vectorized pandas
    inside each shard — same result, none of the tiny-group tax.
    """
    hashed = ds.map_batches(
        lambda b: add_content_hash(b, text_col).select(["content_hash", id_col]),
        batch_format="pyarrow",
    ).map_batches(
        lambda b: b.append_column(
            "shard", pa.array((np.asarray(b["content_hash"], dtype=np.uint64) % np.uint64(shards)).astype(np.int32))
        ),
        batch_format="pyarrow",
    )

    def dedupe_shard(group: pd.DataFrame) -> pd.DataFrame:
        agg = group.groupby("content_hash", as_index=False).agg(
            **{id_col: (id_col, "min"), "dup_count": (id_col, "size")}
        )
        return agg[["content_hash", id_col, "dup_count"]]

    return hashed.groupby("shard").map_groups(dedupe_shard, batch_format="pandas")


# ----------------------------------------------------------- shingles ---

_SHINGLE_BASE = np.uint64(257)


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Vectorized char-k-shingle hashes: polynomial rolling hash base 257
    over utf-8 bytes (values < 2^63, exact, deterministic). One numpy
    pass instead of a python loop per shingle."""
    norm = _normalize(text)
    data = np.frombuffer(norm.encode("utf-8", "ignore"), dtype=np.uint8).astype(np.uint64)
    if len(data) == 0:
        return np.empty(0, dtype=np.uint64)
    if len(data) < k:
        h = np.uint64(0)
        for b in data:
            h = h * _SHINGLE_BASE + b
        return np.array([h], dtype=np.uint64)
    n = len(data) - k + 1
    out = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        out = out * np.uint64(1) + data[j : j + n] * (_SHINGLE_BASE ** np.uint64(k - 1 - j))
    return np.unique(_mix64(out))


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (vectorized, wrapping uint64): spreads the
    polynomial hash over all 64 bits — simhash bit uniformity and
    minhash permutations need it."""
    with np.errstate(over="ignore"):
        h = h.astype(np.uint64)
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
    return h


def char_shingles(text: str, k: int = 5) -> set[int]:
    return set(shingle_hashes(text, k).tolist())


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    sa, sb = char_shingles(a, k), char_shingles(b, k)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


# ------------------------------------------------------------ minhash ---

_MERSENNE = (1 << 61) - 1


class MinHasher:
    """Stateful minhash stage: permutation coefficients are drawn once per
    actor in __init__ from a fixed seed (identical across actors)."""

    def __init__(self, num_perm: int = 128, k: int = 5, seed: int = 42, text_col: str = "text"):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = k
        self.text_col = text_col

    def signature(self, text: str) -> np.ndarray:
        sh = shingle_hashes(text, self.k)
        if len(sh) == 0:
            return np.full(self.num_perm, _MERSENNE, dtype=np.uint64)
        # (a*x + b) mod p for all perms × shingles, take min per perm
        prod = (sh[None, :] * self.a[:, None] + self.b[:, None]) % np.uint64(_MERSENNE)
        return prod.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = np.stack([self.signature(t) for t in batch[self.text_col].to_pylist()])
        return pa.table({
            "doc_id": batch["doc_id"],
            "minhash": pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.reshape(-1), type=pa.uint64()), self.num_perm
            ),
        })


def explode_bands(batch: pa.Table, num_bands: int = 32) -> pa.Table:
    """(doc_id, minhash[128]) → (band, band_hash, doc_id) rows.

    Fully vectorized: the per-band hash is a polynomial combine of the
    band's minhash values + splitmix64 finalizer, computed for every
    (doc, band) cell in `rows_per_band` numpy passes — no Python loop
    over rows."""
    n = batch.num_rows
    sig_len = batch["minhash"].type.list_size
    rows_per_band = sig_len // num_bands
    sigs = np.asarray(batch["minhash"].combine_chunks().flatten()).reshape(
        n, num_bands, rows_per_band
    )
    with np.errstate(over="ignore"):
        h = np.zeros((n, num_bands), dtype=np.uint64)
        for j in range(rows_per_band):
            h = h * np.uint64(0x100000001B3) + sigs[:, :, j]
    h = _mix64(h)
    bands = np.broadcast_to(np.arange(num_bands, dtype=np.int32), (n, num_bands))
    doc_idx = np.repeat(np.arange(n), num_bands)
    return pa.table({
        "band": pa.array(bands.reshape(-1)),
        "band_hash": pa.array(h.reshape(-1), type=pa.uint64()),
        "doc_id": batch["doc_id"].take(pa.array(doc_idx)),
    })


# A band_hash bucket larger than this is degenerate (boilerplate corpus:
# thousands of near-identical docs share a band) — all-pairs there is
# O(b²) and would stall the band task. The cap keeps the first
# `_MAX_LSH_BUCKET` ids (sorted — deterministic) and logs the drop;
# a true dup cluster that large is still fully discovered transitively
# by the surviving pairs + the other bands.
_MAX_LSH_BUCKET = 256
_log = __import__("logging").getLogger(__name__)


def _minhash_fn(batch: pa.Table, num_perm: int, text_col: str) -> pa.Table:
    """Task-pool minhash: the permutation coefficients are seed-derived
    (2 KB) and cached per worker process, so a plain function gets the
    once-per-worker setup without paying actor-pool spin-up — the
    hasher has no real state to justify an actor."""
    key = (num_perm, text_col)
    h = _minhash_fn._cache.get(key)
    if h is None:
        h = _minhash_fn._cache[key] = MinHasher(num_perm=num_perm, text_col=text_col)
    return h(batch)


_minhash_fn._cache = {}


def _raw_lsh_candidates(ds, num_perm: int, num_bands: int, text_col: str,
                        concurrency, max_bucket: int = _MAX_LSH_BUCKET):
    """Band-grouped candidate pairs, deduped within band only (the same
    pair can still arrive from several bands)."""
    sigs = ds.map_batches(
        _minhash_fn,
        fn_kwargs={"num_perm": num_perm, "text_col": text_col},
        batch_format="pyarrow",
    )
    bands = sigs.map_batches(
        lambda b: explode_bands(b, num_bands), batch_format="pyarrow"
    )

    def pairs_in_band(group: pd.DataFrame) -> pd.DataFrame:
        """One shuffle group per band (num_bands groups total); exact
        band_hash bucketing is pandas inside. Buckets above
        `max_bucket` are truncated with a logged drop count."""
        out_a, out_b = [], []
        dropped = 0
        for _, bucket in group.groupby("band_hash", sort=False):
            if len(bucket) < 2:
                continue
            ids = sorted(bucket["doc_id"].unique())
            if len(ids) > max_bucket:
                dropped += len(ids) - max_bucket
                ids = ids[:max_bucket]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        if dropped:
            _log.warning("minhash LSH: degenerate band bucket — dropped %d ids "
                         "beyond the %d cap", dropped, max_bucket)
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b})

    return bands.groupby("band").map_groups(pairs_in_band, batch_format="pandas")


def minhash_lsh_candidates(ds, num_perm: int = 128, num_bands: int = 32,
                           text_col: str = "text", concurrency: int = 2):
    """documents → candidate near-dup pairs (doc_a < doc_b) via LSH banding."""
    cand = _raw_lsh_candidates(ds, num_perm, num_bands, text_col, concurrency)
    return _dedupe_pairs(cand, ["doc_a", "doc_b"])


def minhash_near_dups(ds, threshold: float = 0.7, num_perm: int = 128,
                      num_bands: int = 32, text_col: str = "text",
                      id_col: str = "doc_id", concurrency: int = 2,
                      min_band_agree: int = 2):
    """Verified near-dups: LSH candidates → exact n-gram Jaccard ≥
    threshold. Texts reach the verify stage via two bucketed
    `hash_join`s on the doc id (candidate pairs are the small side) —
    no driver-side materialization of the corpus; only candidate rows
    carry text, and only through the verify stage. The global pair
    dedupe (same pair surfaced by several bands) is folded into the
    first join's buckets via `left_prep` — every (doc_a=X) row hash-
    lands in one bucket, so the in-bucket pair count is GLOBAL and the
    standalone dedupe exchange disappears (3 shuffles total: band
    groupby + two joins).

    `min_band_agree` prefilters candidates to pairs that collide in at
    least that many bands (standard multi-band agreement). At the
    default (b=32, r=4) banding a jaccard-0.7 pair agrees in ~8 bands
    in expectation — P(agree ≥ 2) ≈ 0.9994 — while the sub-threshold
    candidate flood overwhelmingly collides exactly once, so verify
    work drops ~20× with <0.1% recall loss at the threshold. Set 1 to
    disable."""
    from .joins import hash_join

    cand = _raw_lsh_candidates(ds, num_perm, num_bands, text_col, concurrency)

    def texts_as(key: str, val: str):
        return ds.map_batches(
            lambda df: df[[id_col, text_col]].rename(
                columns={id_col: key, text_col: val}
            ),
            batch_format="pandas",
        )

    def agree_filter(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["doc_a", "doc_b"], as_index=False).size()
        g = g[g["size"] >= min_band_agree]
        return g.drop(columns=["size"])

    with_a = hash_join(cand, texts_as("doc_a", "__text_a"), on="doc_a", how="inner",
                       left_prep=agree_filter)
    with_b = hash_join(with_a, texts_as("doc_b", "__text_b"), on="doc_b", how="inner")

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
        # per-task shingle cache: a hub doc in many pairs shingles once
        cache: dict = {}

        def sh(doc, text):
            s = cache.get(doc)
            if s is None:
                s = cache[doc] = char_shingles(text)
            return s

        jac = []
        for a, b, ta, tb in zip(df["doc_a"], df["doc_b"], df["__text_a"], df["__text_b"]):
            sa, sb = sh(a, ta), sh(b, tb)
            if not sa and not sb:
                jac.append(1.0)
                continue
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            jac.append(round(inter / union, 6) if union else 0.0)
        df = df.assign(jaccard=jac)[["doc_a", "doc_b", "jaccard"]]
        return df[df["jaccard"] >= threshold].reset_index(drop=True)

    return with_b.map_batches(verify, batch_format="pandas")


def _dedupe_pairs(cand, cols: list[str], shards: int = 32):
    """Distinct rows via coarse-shard shuffle + vectorized inner dedupe."""

    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["shard"] = pd.util.hash_pandas_object(df[cols[0]], index=False).to_numpy() % shards
        return df

    def dedupe(group: pd.DataFrame) -> pd.DataFrame:
        return group.drop_duplicates(cols).drop(columns=["shard"])

    return (
        cand.map_batches(add_shard, batch_format="pandas")
        .groupby("shard")
        .map_groups(dedupe, batch_format="pandas")
    )


# ------------------------------------------------------------ simhash ---

def simhash_batch(batch: pa.Table, text_col: str = "text", k: int = 5) -> pa.Table:
    """64-bit simhash over char shingles + 4×16-bit segments for
    pigeonhole blocking (hamming ≤3 ⇒ at least one exact segment match)."""
    texts = batch[text_col].to_pylist()
    n = len(texts)
    sims = np.zeros(n, dtype=np.uint64)
    for i, t in enumerate(texts):
        sh = shingle_hashes(t, k)
        if len(sh) == 0:
            continue
        bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        sims[i] = np.packbits((v > 0)[::-1]).view(">u8")[0]
    tbl = {"doc_id": batch["doc_id"], "simhash": pa.array(sims, type=pa.uint64())}
    for seg in range(4):
        seg_vals = (sims >> np.uint64(16 * seg)) & np.uint64(0xFFFF)
        tbl[f"seg{seg}"] = pa.array(seg_vals.astype(np.uint32))
    return pa.table(tbl)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(np.atleast_1d(a).astype(np.uint64), np.atleast_1d(b).astype(np.uint64))
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1).astype(np.int64)


def simhash_near_dups(ds, max_hamming: int = 3, text_col: str = "text"):
    """Near-dup pairs with hamming(simhash) ≤ max_hamming via segment blocking."""
    sh = ds.map_batches(lambda b: simhash_batch(b, text_col), batch_format="pyarrow")

    def explode_blocks(b: pa.Table) -> pa.Table:
        """(doc_id, simhash, seg0..3) → 4 rows per doc keyed by
        block = seg_index<<16 | seg_value (pigeonhole blocking)."""
        n = b.num_rows
        doc = np.asarray(b["doc_id"])
        sim = np.asarray(b["simhash"], dtype=np.uint64)
        blocks, docs, sims = [], [], []
        for seg in range(4):
            segv = np.asarray(b[f"seg{seg}"], dtype=np.uint64)
            blocks.append((np.uint64(seg << 16) | segv).astype(np.uint64))
            docs.append(doc)
            sims.append(sim)
        return pa.table({
            "block": pa.array(np.concatenate(blocks)),
            "doc_id": pa.array(np.concatenate(docs)),
            "simhash": pa.array(np.concatenate(sims), type=pa.uint64()),
            "shard": pa.array((np.concatenate(blocks) % np.uint64(16)).astype(np.int32)),
        })

    def pairs_in_shard(group: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_h = [], [], []
        dropped = 0
        for _, g in group.groupby("block", sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values("doc_id")
            if len(g) > _MAX_LSH_BUCKET:
                # degenerate segment block (hot-bucket cap, see
                # _MAX_LSH_BUCKET): deterministic truncation + logged drop
                dropped += len(g) - _MAX_LSH_BUCKET
                g = g.iloc[:_MAX_LSH_BUCKET]
            ids = g["doc_id"].to_numpy()
            hashes = g["simhash"].to_numpy(dtype=np.uint64)
            for i in range(len(ids) - 1):
                d = hamming64(np.repeat(hashes[i], len(ids) - i - 1), hashes[i + 1 :])
                hit = np.flatnonzero(d <= max_hamming)
                for off in hit:
                    out_a.append(ids[i])
                    out_b.append(ids[i + 1 + off])
                    out_h.append(int(d[off]))
        if dropped:
            _log.warning("simhash blocking: degenerate block — dropped %d ids "
                         "beyond the %d cap", dropped, _MAX_LSH_BUCKET)
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "hamming": out_h})

    allpairs = (
        sh.map_batches(explode_blocks, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(pairs_in_shard, batch_format="pandas")
    )
    return _dedupe_pairs(allpairs, ["doc_a", "doc_b"])
