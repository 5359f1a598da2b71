"""Build-time context precompute: each feature's parent chain.

The query-time `_context_for` (geocode/engine.py) scans every coarser
layer per feature — bbox mask + point-in-polygon — with a per-actor
cache. That is fine when queries revisit few features, but cold-cache
verify at 10×-corpus scale spent ~30% of its time re-deriving static
chains. The chain only depends on the index, so compute it ONCE here as
a Ray stage at build time and store it as a `context_ids` column
(list<string> of parent doc_ids, fine→coarse). Query stages then just
look rows up.

Scale note: this implementation broadcasts the parent pack (the
coarse-layer subset of the feature table — admin polygons, orders of
magnitude smaller than the street/address/poi layers) to each actor via
constructor args, one ship per actor. At 10^12 docs the same stage runs
as a cell-keyed join: parents replicated to the zc-cells their bbox
covers at their own layer zoom, features probing their center cell per
layer, groupby(cell) — semantics identical; see SURVEY.md §3.2.

Reference semantics: lib/geocoder/context.js:31-136 (stacked contexts,
highest-score winner per layer, PIP for polygon layers).
"""

from __future__ import annotations

import pyarrow as pa


class ContextStage:
    """Actor: batch of features → (doc_id, context_ids). Holds the full
    feature pack (test scale) and reuses the engine's `_context_for` so
    build-time chains are byte-identical to the on-the-fly ones."""

    def __init__(self, features=None, layer_zooms: dict | None = None,
                 features_path: str | None = None):
        from ..geocode.engine import IndexData

        if features is None:
            # streaming build: each actor reads the pack from parquet —
            # no driver-side materialization of the feature table
            import glob

            import pyarrow.parquet as _pq

            features = pa.concat_tables(
                [_pq.read_table(p) for p in sorted(glob.glob(f"{features_path}/*.parquet"))],
                promote_options="permissive",
            )
        if "context_ids" in features.column_names:
            features = features.drop_columns(["context_ids"])
        empty_pg = pa.table({c: pa.array([], type=t) for c, t in [
            ("phrase", pa.string()), ("idx", pa.int32()), ("layer", pa.string()),
            ("zoom", pa.int32()), ("relev", pa.float64()), ("score", pa.float64()),
            ("x", pa.int32()), ("y", pa.int32()), ("fid", pa.int64()),
            ("phrase_id", pa.int64()), ("lang_set", pa.uint64()),
        ]})
        self.index = IndexData(features, empty_pg, {}, 1.0, layer_zooms)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Append `context_ids`, the denormalized `context_json`, and the
        feature-shard key `fshard` to the incoming feature rows.

        context_json carries the narrow context attributes the verify
        stage needs (doc_id, layer, idx, fid, text, score) ON the feature
        row itself — a hash(fid)-sharded verify actor can then hydrate a
        candidate without cross-shard feature lookups."""
        import json as _json

        from ..geocode.engine import _context_for

        ids = batch["doc_id"].to_pylist()
        out: list[list[str]] = []
        out_json: list[str] = []
        for doc_id in ids:
            row = self.index.doc_index.get(doc_id)
            if row is None:
                out.append([])
                out_json.append("[]")
                continue
            feature = self.index.feature_at(row)
            ctx = _context_for(self.index, row, int(feature.idx))
            out.append([c.doc_id for c in ctx])
            out_json.append(_json.dumps([
                {"doc_id": c.doc_id, "layer": c.layer, "idx": int(c.idx),
                 "fid": int(c.fid), "text": c.text, "score": float(c.score)}
                for c in ctx
            ]))
        from .. import constants as _c

        drop = [c for c in ("context_ids", "context_json", "fshard")
                if c in batch.column_names]
        if drop:
            batch = batch.drop_columns(drop)
        # FSHARD_MOD is a power of two (no pc.mod kernel in pyarrow)
        fshard = pa.compute.cast(
            pa.compute.bit_wise_and(batch["fid"], _c.FSHARD_MOD - 1), pa.int32())
        return (
            batch
            .append_column("context_ids", pa.array(out, type=pa.list_(pa.string())))
            .append_column("context_json", pa.array(out_json, type=pa.string()))
            .append_column("fshard", fshard)
        )


def attach_context(features: pa.Table, layer_zooms: dict,
                   concurrency: int = 4) -> pa.Table:
    """features table → same table + `context_ids` column (driver-compact
    variant used by build_index; the streaming build runs the same stage
    against its parquet output)."""
    import ray

    import ray.data as rd

    if features.num_rows == 0:
        return features.append_column(
            "context_ids", pa.array([], type=pa.list_(pa.string())))
    annotated = (
        rd.from_arrow(features)
        .repartition(max(2, concurrency))
        .map_batches(
            ContextStage,
            fn_constructor_kwargs={"features": features, "layer_zooms": layer_zooms},
            batch_format="pyarrow",
            concurrency=(1, concurrency),
        )
    )
    tbl = pa.concat_tables(
        ray.get(annotated.to_arrow_refs()), promote_options="permissive"
    )
    # restore the canonical deterministic feature order (blocks may
    # arrive in any order)
    return tbl.sort_by([
        ("idx", "ascending"), ("fid", "ascending"), ("doc_id", "ascending"),
    ])
