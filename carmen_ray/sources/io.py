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

try:  # pragma: no cover - lance is absent in this environment
    import lance as _lance
except ImportError:
    _lance = None


def _resolve_format(format: str | None) -> str:
    """Storage format for a partition: explicit 'lance'/'parquet', or
    auto (Lance — the north star's table format — when importable,
    parquet otherwise). Explicit 'lance' without the lib is an error,
    not a silent fallback."""
    if format is None:
        return "lance" if _lance is not None else "parquet"
    if format == "lance" and _lance is None:
        raise ImportError(
            "format='lance' requested but the lance package is not "
            "installed; pass format=None for automatic fallback")
    if format not in ("lance", "parquet"):
        raise ValueError(f"unknown partition format {format!r}")
    return format


def _read_partition_table(out_dir: str, key: str) -> pa.Table:
    """Read one committed partition regardless of its storage format."""
    d = partition_dir(out_dir, key)
    lance_path = os.path.join(d, "data.lance")
    if os.path.exists(lance_path):
        if _lance is None:
            raise ImportError(
                f"partition {key} was written as Lance but the lance "
                "package is not installed")
        return _lance.dataset(lance_path).to_table()
    return pq.read_table(os.path.join(d, "data.parquet"))


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
                    input_digest: str | None = None,
                    format: str | None = None) -> dict:
    """Atomic partition write + lineage commit. Returns the lineage rec.

    `format`: 'parquet' | 'lance' | None (auto: Lance when importable).
    The layout contract (part=<key>/ dir, _lineage.json, atomic rename,
    manifest) is identical for both formats."""
    t0 = time.time()
    fmt = _resolve_format(format)
    final = partition_dir(out_dir, key)
    tmp = final + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    if fmt == "lance":
        _lance.write_dataset(tbl, os.path.join(tmp, "data.lance"))
    else:
        pq.write_table(tbl, os.path.join(tmp, "data.parquet"))
    lineage = {
        "partition": key,
        "rows": tbl.num_rows,
        "format": fmt,
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
    # unique tmp per writer: concurrent partition writers each rebuild
    # the manifest; a shared tmp name would interleave their writes
    # (corrupt JSON), while distinct tmps + os.replace serialize to
    # some writer's consistent snapshot
    tmp = os.path.join(out_dir, f"_manifest.json.tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(out_dir, "_manifest.json"))


def read_partitions(out_dir: str) -> pa.Table:
    tables = []
    for key in sorted(completed_partitions(out_dir)):
        tables.append(_read_partition_table(out_dir, key))
    return pa.concat_tables(tables, promote_options="permissive") if tables else pa.table({})


# write-task granularity for write_dataset_partitioned: partition keys
# hash into this many exchange buckets (explicit integer boundaries →
# one write task per bucket)
_WRITE_BUCKETS = 64


def write_dataset_partitioned(ds, out_dir: str, key_fn, resume: bool = True,
                              format: str | None = None) -> dict[str, dict]:
    """Write a Dataset partitioned by key_fn(batch)->key column, skipping
    already-complete partitions when resuming.

    Distributed, single-writer-per-key by construction: keys hash into
    integer buckets and the exchange is a sort with EXPLICIT boundaries
    between bucket values — unlike a sampled-boundary sort (or the
    groupby(__part) this replaced), equal keys can never straddle a
    partition boundary, so no two tasks ever write the same partition.
    (The groupby version lost rows whenever the sort's sampled
    boundaries landed inside a low-cardinality key run: two concurrent
    write_partition calls raced on the same tmp dir.) Each task slices
    its bucket block by key and commits each key's partition atomically
    via `write_partition` (tmp + rename → idempotent for Ray retries
    and killed-run resumes). A same-run duplicate writer — possible
    only if Ray ever splits a sort reduce output across blocks, the
    version-pinned invariant tested in test_exchange_invariant — is
    detected through the run nonce in lineage and fails loudly instead
    of silently dropping the first writer's rows. Only per-partition
    lineage summaries return to the driver — no partition data is ever
    buffered driver-side.

    `format`: per-partition storage, as in `write_partition`. Callers
    that will re-read the partitions through `ray.data.read_parquet`
    (e.g. the staged query-path checkpoint) pin format='parquet'."""
    import uuid

    import numpy as np
    import pyarrow.compute as pc

    os.makedirs(out_dir, exist_ok=True)
    nonce = uuid.uuid4().hex

    def add_bucket(tbl: pa.Table) -> pa.Table:
        b = [fnv1a_64(str(k)) % _WRITE_BUCKETS
             for k in tbl.column("__part").to_pylist()]
        return tbl.append_column("__pbucket", pa.array(b, type=pa.int64()))

    def write_bucket(tbl: pa.Table) -> pa.Table:
        parts, nrows, skips = [], [], []
        if tbl.num_rows:
            order = pc.sort_indices(tbl.column("__part"))
            tbl = tbl.take(order)
            keys = np.asarray(tbl.column("__part").to_pylist())
            starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
            ends = np.r_[starts[1:], len(keys)]
            for s, e in zip(starts.tolist(), ends.tolist()):
                key = str(keys[s])
                skipped = False
                if is_complete(out_dir, key):
                    lp = os.path.join(partition_dir(out_dir, key),
                                      "_lineage.json")
                    with open(lp) as f:
                        rec = json.load(f)
                    if rec.get("input_digest") == f"run:{nonce}":
                        raise RuntimeError(
                            f"partition {key!r} written twice in one "
                            "run: an exchange bucket was split across "
                            "blocks (one-block-per-partition sort "
                            "invariant broken)")
                    skipped = bool(resume)
                if not skipped:
                    write_partition(
                        out_dir, key,
                        tbl.slice(s, e - s).drop_columns(
                            ["__part", "__pbucket"]),
                        input_digest=f"run:{nonce}", format=format)
                parts.append(key)
                nrows.append(e - s)
                skips.append(skipped)
        return pa.table({
            "part": pa.array(parts, type=pa.string()),
            "rows": pa.array(nrows, type=pa.int64()),
            "skipped": pa.array(skips, type=pa.bool_()),
        })

    written = (
        ds.map_batches(key_fn, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .sort("__pbucket", boundaries=list(range(1, _WRITE_BUCKETS)))
        .map_batches(write_bucket, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    lineages = {}
    for part in written["part"]:
        lp = os.path.join(partition_dir(out_dir, part), "_lineage.json")
        if os.path.exists(lp):
            with open(lp) as f:
                lineages[part] = json.load(f)
    return lineages


def write_index(index, out_dir: str, resume: bool = True,
                format: str | None = None) -> None:
    """Persist a CarmenIndex in the resumable layout: features sharded by
    fid % 16, phrase_grid by prefix bin % 16, media cells whole.
    `format` selects the per-partition storage (Lance when importable,
    parquet fallback — same layout contract)."""
    import numpy as np

    os.makedirs(out_dir, exist_ok=True)

    feats = index.features
    fid = np.asarray(feats["fid"], dtype=np.int64) % 16
    for shard in range(16):
        key = f"features-{shard:02d}"
        if resume and is_complete(out_dir, key):
            continue
        write_partition(out_dir, key, feats.filter(pa.array(fid == shard)),
                        format=format)

    pg = index.phrase_grid
    pid = (np.asarray(pg["phrase_id"], dtype=np.int64) >> 40) % 16
    for shard in range(16):
        key = f"phrasegrid-{shard:02d}"
        if resume and is_complete(out_dir, key):
            continue
        write_partition(out_dir, key, pg.filter(pa.array(pid == shard)),
                        format=format)

    if not (resume and is_complete(out_dir, "mediacells")):
        write_partition(out_dir, "mediacells", index.media_cells,
                        format=format)
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
        [_read_partition_table(out_dir, k)
         for k in sorted(parts) if k.startswith("features-")],
        promote_options="permissive",
    )
    pg = pa.concat_tables(
        [_read_partition_table(out_dir, k)
         for k in sorted(parts) if k.startswith("phrasegrid-")],
        promote_options="permissive",
    )
    media = _read_partition_table(out_dir, "mediacells")
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


def validate_geojson_doc(doc: dict) -> None:
    """Index-time document validation, re-deriving the reference's
    runChecks (/root/reference/lib/indexer/indexdocs.js:164-212) plus
    the geojsonhint basics it relies on: id/geometry/properties/
    carmen:text presence, the synonym cap for address-style docs, the
    geocoder_stack type check, and the 50k polygon-vertex cap.
    Raises ValueError with reference-equivalent messages."""
    from .. import constants

    if not doc.get("id"):
        raise ValueError("doc has no id")
    doc_id = doc["id"]
    if doc.get("type") != "Feature":
        raise ValueError(f"GeoJSON object must be a Feature on id:{doc_id}")
    geom = doc.get("geometry")
    if not geom:
        raise ValueError(f"doc has no geometry on id: {doc_id}")
    gtype = geom.get("type")
    valid_types = {"Point", "MultiPoint", "LineString", "MultiLineString",
                   "Polygon", "MultiPolygon", "GeometryCollection"}
    if gtype not in valid_types:
        raise ValueError(f"invalid geometry type {gtype} on id:{doc_id}")
    if gtype == "GeometryCollection":
        # single-geometry GeometryCollections are allowed — the
        # reference uses them for pt/itp addresses (indexdocs.js:175)
        if not geom.get("geometries"):
            raise ValueError(f"GeometryCollection has no geometries on id:{doc_id}")
    elif geom.get("coordinates") is None:
        raise ValueError(f"geometry has no coordinates on id:{doc_id}")
    props = doc.get("properties")
    if not props:
        raise ValueError(f"doc has no properties on id:{doc_id}")
    text = props.get("carmen:text")
    if not text:
        raise ValueError(f"doc has no carmen:text on id:{doc_id}")
    if len(str(text).split(",")) > constants.MAX_TEXT_SYNONYMS and (
            props.get("carmen:addressnumber") or props.get("carmen:rangetype")
            or props.get("carmen:intersections")):
        raise ValueError(
            f"doc's carmen:text on id:{doc_id} has more than the allowed "
            f"{constants.MAX_TEXT_SYNONYMS} synonyms")
    stack = props.get("carmen:geocoder_stack")
    if stack is not None and not isinstance(stack, str):
        raise ValueError("geocoder_stack must be a string value")
    if gtype in ("Polygon", "MultiPolygon"):
        rings = geom["coordinates"] if gtype == "Polygon" else [
            r for poly in geom["coordinates"] for r in poly]
        if sum(len(r) for r in rings) > 50000:
            raise ValueError(
                "Polygons may not have more than 50k vertices. Simplify "
                "your polygons, or split the polygon into multiple parts "
                f"on id:{doc_id}")


def _flatten_nested(v) -> list:
    """carmen:addressnumber / range arrays come GeometryCollection-
    nested ([[...]]); accept flat lists too."""
    if isinstance(v, list) and v and isinstance(v[0], list):
        return [x for sub in v for x in sub]
    return list(v or [])


def geojson_doc_to_spans(doc: dict, layer: str) -> tuple[str, list[dict]]:
    """One validated carmen GeoJSON feature → the input_hint span row
    (sources/synth.py span encoding). Returns (doc_id, spans)."""
    import json as _json

    validate_geojson_doc(doc)
    props = doc["properties"]
    geom = doc["geometry"]
    entries: list[tuple[str, str, str]] = []
    names = [s.strip() for s in str(props["carmen:text"]).split(",") if s.strip()]
    entries.append(("text", names[0], ""))
    for syn in names[1:]:
        entries.append(("synonym", syn, ""))
    for k, v in props.items():
        if k.startswith("carmen:text_") and v:
            entries.append((f"lang:{k[len('carmen:text_'):]}", str(v).split(",")[0], ""))

    addr_numbers = props.get("carmen:addressnumber")
    rangetype = props.get("carmen:rangetype")
    if geom["type"] == "GeometryCollection":
        # pt/itp address docs: the indexable geometry is the member the
        # address arrays align with (MultiPoint for clusters, the
        # MultiLineString for tiger ranges); single-member collections
        # unwrap directly
        members = geom["geometries"]
        pick = members[0]
        if addr_numbers and rangetype:
            # interleaved pt+itp: prefer the MultiPoint for the cluster
            for m in members:
                if m.get("type") == "MultiPoint":
                    pick = m
                    break
        geom = pick
    entries.append(("geom", _json.dumps(geom), ""))

    center = props.get("carmen:center")
    if center is None:
        center = _geom_center(geom)
    entries.append(("center", f"{center[0]},{center[1]}", ""))
    entries.append(("score", str(props.get("carmen:score", 0)), ""))

    if addr_numbers:
        nums = [str(n) for n in _flatten_nested(addr_numbers)]
        entries.append(("addr_numbers", ",".join(nums), ""))
    if rangetype:
        rng = {
            key: props.get(f"carmen:{key}") or [[]]
            for key in ("lfromhn", "ltohn", "rfromhn", "rtohn",
                        "parityl", "parityr")
        }
        entries.append(("addr_range", _json.dumps(rng), ""))
    for isect in props.get("carmen:intersections") or []:
        entries.append(("intersection", str(isect), ""))

    spans = [
        {"kind": k, "text": t, "media_ref": m, "offset": i}
        for i, (k, t, m) in enumerate(entries)
    ]
    return f"{layer}.{doc['id']}", spans


def _geom_center(geom: dict) -> list:
    """Fallback carmen:center: first coordinate's bbox midpoint."""
    coords = geom.get("coordinates")
    pts: list = []

    def walk(c):
        if isinstance(c, (list, tuple)) and c and isinstance(c[0], (int, float)):
            pts.append(c)
        elif isinstance(c, (list, tuple)):
            for x in c:
                walk(x)

    walk(coords)
    lons = [p[0] for p in pts]
    lats = [p[1] for p in pts]
    return [(min(lons) + max(lons)) / 2, (min(lats) + max(lats)) / 2]


def read_geojson_docs(path: str, layer: str):
    """Stream an NDJSON GeoJSON file (the reference's native input —
    bin/carmen-index.js:19-53 reads line-delimited features from stdin)
    into an input_hint-shaped Dataset of (doc_id, spans).

    The parse/validate step runs distributed (map_batches over text
    lines); invalid docs raise, matching the reference's fail-fast
    indexing (lib/indexer/index.js:42-68)."""
    import json as _json

    import ray.data as rd

    from .synth import SPAN_TYPE

    def parse_lines(batch: pa.Table) -> pa.Table:
        doc_ids, spans = [], []
        for line in batch["text"].to_pylist():
            line = line.strip()
            if not line:
                continue
            doc_id, sp = geojson_doc_to_spans(_json.loads(line), layer)
            doc_ids.append(doc_id)
            spans.append(sp)
        return pa.table({
            "doc_id": pa.array(doc_ids, type=pa.string()),
            "spans": pa.array(spans, type=pa.list_(SPAN_TYPE)),
        })

    return rd.read_text(path).map_batches(parse_lines, batch_format="pyarrow")


def write_docs(ds, path: str) -> None:
    """Write an interleaved-document Dataset (Lance when available)."""
    try:  # pragma: no cover
        import lance  # noqa: F401

        ds.write_lance(path)
    except ImportError:
        ds.write_parquet(path)
