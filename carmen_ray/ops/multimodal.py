"""Multimodal column stages: decode / feature-extract / resize /
frame-sample over opaque `binary` media columns.

Image decode is REAL for PNG payloads (ops/imaging.py — a pure
zlib+numpy codec, no external library needed) and, when PIL happens to
be importable, for other formats too. Non-image payloads (the
bench/test fakes are hash-seeded random bytes) fall back to the
deterministic stub so the pipeline shape stays exercised end-to-end in
this container. Audio/video codecs remain env-gated stubs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..util.hashing import fnv1a_64
from .imaging import PNG_MAGIC, decode_image, encode_png, resize_nearest

MEDIA_SCHEMA = pa.schema([
    ("media_ref", pa.string()),
    ("payload", pa.binary()),          # opaque bytes (image/audio/video)
    ("media_type", pa.string()),       # "image" | "audio" | "video"
    ("width", pa.int32()),             # typed metadata alongside the blob
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def fake_media_batch(refs: list[str], media_type: str = "image") -> pa.Table:
    """Deterministic fake payloads for tests/bench (seeded by ref hash)."""
    payloads, widths, heights, durs = [], [], [], []
    for r in refs:
        h = fnv1a_64(r)
        rng = np.random.RandomState(h % (2**31))
        n = 256 + (h % 1024)
        payloads.append(rng.bytes(n))
        widths.append(64 + h % 512)
        heights.append(64 + (h >> 10) % 512)
        durs.append(0 if media_type == "image" else 1000 + h % 60000)
    return pa.table({
        "media_ref": pa.array(refs, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "media_type": pa.array([media_type] * len(refs), type=pa.string()),
        "width": pa.array(widths, type=pa.int32()),
        "height": pa.array(heights, type=pa.int32()),
        "duration_ms": pa.array(durs, type=pa.int32()),
    })


def _decode_image_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decode for non-image payloads (test/bench fakes).

    Deterministic fake: derives a small luma plane from the payload hash
    so downstream feature math is stable and testable.
    """
    h = fnv1a_64(payload)
    rng = np.random.RandomState(h % (2**31))
    return rng.randint(0, 256, size=(min(height, 32), min(width, 32)), dtype=np.uint8)


def _decode_luma(payload: bytes, width: int, height: int) -> np.ndarray:
    """Real decode when the payload IS an image (PNG natively; PIL when
    importable), stub otherwise; always returns a 2-D luma plane."""
    try:
        img = decode_image(payload)
    except ValueError:
        return _decode_image_stub(payload, width, height)
    if img.ndim == 3:  # ITU-R 601 luma, rounded to uint8
        img = np.clip(np.round(
            0.299 * img[:, :, 0] + 0.587 * img[:, :, 1]
            + 0.114 * img[:, :, 2]), 0, 255).astype(np.uint8)
    return img


class ImageFeatures:
    """Actor-pool stage: decode → embed. __init__ = model load (stubbed);
    __call__ = per-batch decode + feature extraction.

    Production sizing: payloads are MBs → batch_size small (e.g. 32) and
    concurrency × num_cpus ≤ node CPUs; the object store handles spill.
    """

    def __init__(self, embed_dim: int = 16):
        # model load goes here (ONNX session / torch module); stub: a
        # fixed projection matrix, seeded once per actor.
        rng = np.random.RandomState(1234)
        self.proj = rng.normal(size=(1024, embed_dim)).astype(np.float32)
        self.embed_dim = embed_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        widths = batch["width"].to_pylist()
        heights = batch["height"].to_pylist()
        embs = np.zeros((len(payloads), self.embed_dim), dtype=np.float32)
        lumas = np.zeros(len(payloads), dtype=np.float64)
        for i, (p, w, h) in enumerate(zip(payloads, widths, heights)):
            img = _decode_luma(p, w, h)
            lumas[i] = float(img.mean())
            flat = np.zeros(1024, dtype=np.float32)
            v = img.reshape(-1).astype(np.float32)
            flat[: min(1024, len(v))] = v[:1024]
            embs[i] = flat @ self.proj
        return pa.table({
            "media_ref": batch["media_ref"],
            "mean_luma": pa.array(np.round(lumas, 4)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(embs.reshape(-1)), self.embed_dim
            ),
        })


class Resize:
    """Actor-pool resize stage: payload binary in → payload binary out
    with width=height=target. REAL for PNG payloads (pure zlib+numpy
    decode → nearest-neighbor resample → PNG re-encode); other formats
    need PIL (env-gated) and raise NotImplementedError otherwise."""

    def __init__(self, target: int = 224):
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_payload, out_w, out_h = [], [], []
        for p in batch["payload"].to_pylist():
            if not p.startswith(PNG_MAGIC):
                try:
                    img = decode_image(p)  # PIL path when importable
                except ValueError:
                    raise NotImplementedError(
                        "resize of non-PNG payloads requires an image "
                        "library (PIL/libvips) not present in this "
                        "container") from None
            else:
                img = decode_image(p)
            small = resize_nearest(img, self.target, self.target)
            out_payload.append(encode_png(small))
            out_w.append(self.target)
            out_h.append(self.target)
        return pa.table({
            "media_ref": batch["media_ref"],
            "payload": pa.array(out_payload, type=pa.binary()),
            "media_type": batch["media_type"],
            "width": pa.array(out_w, type=pa.int32()),
            "height": pa.array(out_h, type=pa.int32()),
            "duration_ms": batch["duration_ms"],
        })


def frame_sample_batch(batch: pa.Table, every_ms: int = 1000) -> pa.Table:
    """Video frame sampling: emits one row per sampled frame timestamp
    (decode stubbed; timestamps real)."""
    out_ref, out_ts = [], []
    for ref, dur in zip(batch["media_ref"].to_pylist(), batch["duration_ms"].to_pylist()):
        for ts in range(0, max(int(dur), 1), every_ms):
            out_ref.append(ref)
            out_ts.append(ts)
    return pa.table({
        "media_ref": pa.array(out_ref, type=pa.string()),
        "frame_ts_ms": pa.array(out_ts, type=pa.int32()),
    })


def media_feature_pipeline(refs_ds, embed_dim: int = 16, batch_size: int = 32, concurrency: int = 2):
    """refs (media_ref) → fake payloads → actor-pool feature extraction.
    The shape of a real 100 TB media pipeline: read_parquet(binary col)
    → map_batches(ImageFeatures, small batches, actor pool)."""

    def attach_payloads(b: pa.Table) -> pa.Table:
        return fake_media_batch(b["media_ref"].to_pylist())

    return refs_ds.map_batches(attach_payloads, batch_format="pyarrow").map_batches(
        ImageFeatures,
        fn_constructor_kwargs={"embed_dim": embed_dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency) if isinstance(concurrency, int) else concurrency,
    )
