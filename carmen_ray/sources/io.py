"""Resumable partitioned output with per-partition lineage — the
checkpoint/resume layer the north rule requires.

Layout (one directory per partition, written atomically):

    out/
      <table>/
        part=<key>/
          data.parquet          # the partition's rows
          _lineage.json         # {partition, rows, input_digest, wall_s, engine_version}
        _manifest.json          # completed partitions (rewritten after each commit)

Resume = `remaining_partitions(out, keys)`: a killed run (e.g. a
pre-empted `ray job submit`) reruns only the partitions without a
committed lineage record. Writes go to a tmp dir then `os.rename` —
readers never observe partial partitions.

The reference has no checkpointing at all (SURVEY.md §4: index build
restarts from scratch); this layer is new engineering the 10^12-doc
target demands.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq

from ..util.hashing import fnv1a_64

ENGINE_VERSION = "carmen_ray-0.1"


def partition_dir(out_dir: str, key: str) -> str:
    return os.path.join(out_dir, f"part={key}")


def is_complete(out_dir: str, key: str) -> bool:
    return os.path.exists(os.path.join(partition_dir(out_dir, key), "_lineage.json"))


def remaining_partitions(out_dir: str, keys: list[str]) -> list[str]:
    return [k for k in keys if not is_complete(out_dir, k)]


def completed_partitions(out_dir: str) -> dict[str, dict]:
    out = {}
    if not os.path.isdir(out_dir):
        return out
    for name in os.listdir(out_dir):
        if not name.startswith("part="):
            continue
        lineage = os.path.join(out_dir, name, "_lineage.json")
        if os.path.exists(lineage):
            with open(lineage) as f:
                out[name[len("part="):]] = json.load(f)
    return out


def table_digest(tbl: pa.Table) -> str:
    """Order-insensitive content digest (xor of row hashes over a stable
    string form) — cheap lineage fingerprint, not cryptographic."""
    import pyarrow.compute as pc

    acc = 0
    for col in sorted(tbl.column_names):
        try:
            vals = pc.cast(tbl[col], pa.string(), safe=False).to_pylist()
        except pa.lib.ArrowNotImplementedError:
            vals = [str(v) for v in tbl[col].to_pylist()]  # nested types
        for v in vals:
            acc ^= fnv1a_64(f"{col}={v}")
    return f"{acc:016x}"


def write_partition(out_dir: str, key: str, tbl: pa.Table,
                    input_digest: str | None = None) -> dict:
    """Atomic partition write + lineage commit. Returns the lineage rec."""
    t0 = time.time()
    final = partition_dir(out_dir, key)
    tmp = final + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(tbl, os.path.join(tmp, "data.parquet"))
    lineage = {
        "partition": key,
        "rows": tbl.num_rows,
        "input_digest": input_digest or table_digest(tbl),
        "wall_s": round(time.time() - t0, 3),
        "engine_version": ENGINE_VERSION,
        "committed_at": time.time(),
    }
    with open(os.path.join(tmp, "_lineage.json"), "w") as f:
        json.dump(lineage, f)
    if os.path.exists(final):
        shutil.rmtree(final)
    os.rename(tmp, final)
    _update_manifest(out_dir)
    return lineage


def _update_manifest(out_dir: str) -> None:
    manifest = {
        "engine_version": ENGINE_VERSION,
        "partitions": completed_partitions(out_dir),
        "updated_at": time.time(),
    }
    tmp = os.path.join(out_dir, "_manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(out_dir, "_manifest.json"))


def read_partitions(out_dir: str) -> pa.Table:
    tables = []
    for key in sorted(completed_partitions(out_dir)):
        tables.append(pq.read_table(os.path.join(partition_dir(out_dir, key), "data.parquet")))
    return pa.concat_tables(tables, promote_options="permissive") if tables else pa.table({})


def write_dataset_partitioned(ds, out_dir: str, key_fn, resume: bool = True) -> dict[str, dict]:
    """Write a Dataset partitioned by key_fn(batch)->key column, skipping
    already-complete partitions when resuming.

    Distributed: one groupby(__part) shuffle, then each group's task
    writes its own partition via `write_partition` (atomic rename →
    idempotent, so Ray retries and killed-run resumes are safe). Only
    per-partition lineage summaries return to the driver — no partition
    data is ever buffered driver-side."""
    os.makedirs(out_dir, exist_ok=True)

    def write_group(tbl: pa.Table) -> pa.Table:
        key = str(tbl["__part"][0].as_py())
        skipped = bool(resume and is_complete(out_dir, key))
        if not skipped:
            write_partition(out_dir, key, tbl.drop_columns(["__part"]))
        return pa.table({
            "part": pa.array([key], type=pa.string()),
            "rows": pa.array([tbl.num_rows], type=pa.int64()),
            "skipped": pa.array([skipped]),
        })

    written = (
        ds.map_batches(key_fn, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(write_group, batch_format="pyarrow")
        .to_pandas()
    )
    lineages = {}
    for part in written["part"]:
        lp = os.path.join(partition_dir(out_dir, part), "_lineage.json")
        if os.path.exists(lp):
            with open(lp) as f:
                lineages[part] = json.load(f)
    return lineages


def write_index(index, out_dir: str, resume: bool = True) -> None:
    """Persist a CarmenIndex in the resumable layout: features sharded by
    fid % 16, phrase_grid by prefix bin % 16, media cells whole."""
    import numpy as np

    os.makedirs(out_dir, exist_ok=True)

    feats = index.features
    fid = np.asarray(feats["fid"], dtype=np.int64) % 16
    for shard in range(16):
        key = f"features-{shard:02d}"
        if resume and is_complete(out_dir, key):
            continue
        write_partition(out_dir, key, feats.filter(pa.array(fid == shard)))

    pg = index.phrase_grid
    pid = (np.asarray(pg["phrase_id"], dtype=np.int64) >> 40) % 16
    for shard in range(16):
        key = f"phrasegrid-{shard:02d}"
        if resume and is_complete(out_dir, key):
            continue
        write_partition(out_dir, key, pg.filter(pa.array(pid == shard)))

    if not (resume and is_complete(out_dir, "mediacells")):
        write_partition(out_dir, "mediacells", index.media_cells)
    meta = {
        "freq": index.freq,
        "max_score": index.max_score,
        "layer_zooms": index.layer_zooms,
    }
    with open(os.path.join(out_dir, "index_meta.json"), "w") as f:
        json.dump(meta, f)


def load_index(out_dir: str):
    from ..index.build import CarmenIndex

    with open(os.path.join(out_dir, "index_meta.json")) as f:
        meta = json.load(f)
    parts = completed_partitions(out_dir)
    feats = pa.concat_tables(
        [pq.read_table(os.path.join(partition_dir(out_dir, k), "data.parquet"))
         for k in sorted(parts) if k.startswith("features-")],
        promote_options="permissive",
    )
    pg = pa.concat_tables(
        [pq.read_table(os.path.join(partition_dir(out_dir, k), "data.parquet"))
         for k in sorted(parts) if k.startswith("phrasegrid-")],
        promote_options="permissive",
    )
    media = pq.read_table(os.path.join(partition_dir(out_dir, "mediacells"), "data.parquet"))
    feats = feats.sort_by([
        ("idx", "ascending"), ("fid", "ascending"), ("doc_id", "ascending"),
    ])
    return CarmenIndex(
        features=feats,
        phrase_grid=pg.sort_by([
            ("phrase", "ascending"), ("idx", "ascending"), ("fid", "ascending"),
            ("x", "ascending"), ("y", "ascending"), ("lang_set", "ascending"),
        ]),
        media_cells=media,
        freq=meta["freq"],
        max_score=meta["max_score"],
        layer_zooms=meta["layer_zooms"],
    )


def read_docs(path: str, columns: list[str] | None = None):
    """Read an interleaved-document table as a Dataset.

    Prefers the Lance format (the north star's storage layer) when the
    `lance` package is importable; falls back to parquet in this
    environment (lance is not installed — the column contract is
    identical either way).
    """
    import ray.data as rd

    try:  # pragma: no cover - lance not installed here
        import lance  # noqa: F401

        return rd.read_lance(path, columns=columns)
    except ImportError:
        return rd.read_parquet(path, columns=columns)


def write_docs(ds, path: str) -> None:
    """Write an interleaved-document Dataset (Lance when available)."""
    try:  # pragma: no cover
        import lance  # noqa: F401

        ds.write_lance(path)
    except ImportError:
        ds.write_parquet(path)
