"""Index analysis + cell-geometry pack operators.

- analyze_index (A6, /root/reference/lib/util/analyze.js:21-54): total
  grids, counts by 3-bit score bucket and relev bucket, duplicate-grid
  detection — expressed as vectorized partial counts + a coarse-shard
  combine (the ops/agg pattern).
- cell_geometry_pack (S7, lib/indexer/addfeature.js:173-227's vector
  tiles re-thought): explode features to (cell, doc ref) rows at a
  context zoom and pack one row per cell with the doc ids + geometries
  it contains — the reverse-geocode/context lookup table, partitioned
  by cell for the actor-LRU (ST3) to page in.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import grid as gridmod


def analyze_index(phrase_grid_ds):
    """→ one-row summary + per-bucket counts (Dataset)."""

    def partial(b: pa.Table) -> pa.Table:
        relev = np.asarray(b["relev"], dtype=np.float64)
        score3 = np.asarray(b["score3"], dtype=np.int64)
        rows = {"bucket": [], "n": []}
        for s in range(8):
            rows["bucket"].append(f"score_{s}")
            rows["n"].append(int((score3 == s).sum()))
        for r in (0.4, 0.6, 0.8, 1.0):
            rows["bucket"].append(f"relev_{r}")
            rows["n"].append(int((np.abs(relev - r) < 0.1).sum()))
        rows["bucket"].append("total_grids")
        rows["n"].append(b.num_rows)
        return pa.table({"bucket": pa.array(rows["bucket"]),
                         "n": pa.array(rows["n"], type=pa.int64())})

    from ..ops.agg import Spec, grouped_aggregate

    return grouped_aggregate(
        phrase_grid_ds.map_batches(partial, batch_format="pyarrow"),
        ["bucket"], [Spec("n", "n", "sum")],
    )


def duplicate_grids(phrase_grid_ds, num_shards: int = 16):
    """Duplicate-grid check: rows where the same (phrase, packed grid)
    appears more than once (analyze.js flags these as index bugs)."""

    def pack(b: pa.Table) -> pa.Table:
        packed = gridmod.encode(
            np.asarray(b["x"]), np.asarray(b["y"]),
            np.asarray(b["relev"], dtype=np.float64),
            np.asarray(b["score3"], dtype=np.int64),
            np.asarray(b["fid"]),
        )
        shard = (packed % np.uint64(num_shards)).astype(np.int32)
        return pa.table({
            "phrase": b["phrase"],
            "packed": pa.array(packed, type=pa.uint64()),
            "shard": pa.array(shard),
        })

    def dupes(group: pd.DataFrame) -> pd.DataFrame:
        counts = group.groupby(["phrase", "packed"], as_index=False).size()
        return counts[counts["size"] > 1].rename(columns={"size": "n_dupes"})

    return (
        phrase_grid_ds.map_batches(pack, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(dupes, batch_format="pandas")
        .map_batches(lambda df: df.drop(columns=["shard"], errors="ignore"), batch_format="pandas")
    )


def cell_geometry_pack(features_ds, zoom: int = 10, num_shards: int = 32):
    """features → one row per cell: (cell_x, cell_y, zoom, doc_ids,
    layers, geometries). The shuffle key is a coarse shard of the cell;
    exact per-cell packing is vectorized inside. Output partitions are
    the unit of the reverse-geocode actor LRU and of resumable writes
    (sources/io.write_dataset_partitioned keyed by cell shard)."""
    from ..geom.tile import lonlat_to_tile

    def explode(b: pa.Table) -> pa.Table:
        out = {"cell_x": [], "cell_y": [], "doc_id": [], "layer": [], "geometry_json": []}
        lons = b["center_lon"].to_pylist()
        lats = b["center_lat"].to_pylist()
        xs, ys = lonlat_to_tile(lons, lats, zoom)
        for i in range(b.num_rows):
            out["cell_x"].append(int(xs[i]))
            out["cell_y"].append(int(ys[i]))
            out["doc_id"].append(b["doc_id"][i].as_py())
            out["layer"].append(b["layer"][i].as_py())
            out["geometry_json"].append(b["geometry_json"][i].as_py())
        t = pa.table({k: pa.array(v) for k, v in out.items()})
        shard = (np.asarray(t["cell_x"], dtype=np.int64) * 31 + np.asarray(t["cell_y"], dtype=np.int64)) % num_shards
        return t.append_column("shard", pa.array(shard.astype(np.int32)))

    def pack_cells(group: pd.DataFrame) -> pd.DataFrame:
        packed = group.groupby(["cell_x", "cell_y"]).agg(
            doc_ids=("doc_id", list),
            layers=("layer", list),
            geometries=("geometry_json", list),
            n_features=("doc_id", "size"),
        ).reset_index()
        packed["zoom"] = zoom
        return packed

    return (
        features_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(pack_cells, batch_format="pandas")
        .map_batches(lambda df: df.drop(columns=["shard"], errors="ignore"), batch_format="pandas")
    )
