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


def cell_geometry_pack(features_ds, zoom: int = 10, num_shards: int = 32,
                       salt_threshold: int | None = None, salt_factor: int = 4):
    """features → one row per (cell [, salt]): (cell_x, cell_y, zoom,
    salt, doc_ids, layers, geometries). The shuffle key is a coarse
    shard of the cell; exact per-cell packing is vectorized inside.

    Hot-cell salting (the north rule's skew handling): when
    `salt_threshold` is set, a first cheap counting pass finds cells
    with more than `salt_threshold` features (dense urban tiles under
    the Zipf skew); their rows get salt = hash(doc_id) % salt_factor
    appended to the shuffle key, splitting each hot cell into
    `salt_factor` balanced sub-partitions instead of one straggler
    group. Readers merge sub-partitions by (cell_x, cell_y).
    """
    from ..geom.tile import lonlat_to_tile
    from ..util.hashing import fnv1a_64

    hot_cells: frozenset = frozenset()
    if salt_threshold is not None:
        # pass 1: tiny count-per-cell aggregate → broadcast hot set
        def count_cells(b: pa.Table) -> pa.Table:
            xs, ys = lonlat_to_tile(b["center_lon"].to_pylist(), b["center_lat"].to_pylist(), zoom)
            df = pd.DataFrame({"cell_x": np.asarray(xs), "cell_y": np.asarray(ys)})
            g = df.groupby(["cell_x", "cell_y"], as_index=False).size()
            return pa.Table.from_pandas(g, preserve_index=False)

        from ..ops.agg import Spec, grouped_aggregate

        counts = grouped_aggregate(
            features_ds.map_batches(count_cells, batch_format="pyarrow"),
            ["cell_x", "cell_y"], [Spec("n", "size", "sum")],
        ).to_pandas()
        hot = counts[counts["n"] > salt_threshold]
        hot_cells = frozenset(zip(hot["cell_x"].astype(int), hot["cell_y"].astype(int)))

    def explode(b: pa.Table) -> pa.Table:
        out = {"cell_x": [], "cell_y": [], "salt": [], "doc_id": [], "layer": [], "geometry_json": []}
        lons = b["center_lon"].to_pylist()
        lats = b["center_lat"].to_pylist()
        xs, ys = lonlat_to_tile(lons, lats, zoom)
        for i in range(b.num_rows):
            cx, cy = int(xs[i]), int(ys[i])
            doc = b["doc_id"][i].as_py()
            out["cell_x"].append(cx)
            out["cell_y"].append(cy)
            out["salt"].append(fnv1a_64(doc) % salt_factor if (cx, cy) in hot_cells else 0)
            out["doc_id"].append(doc)
            out["layer"].append(b["layer"][i].as_py())
            out["geometry_json"].append(b["geometry_json"][i].as_py())
        t = pa.table({k: pa.array(v) for k, v in out.items()})
        shard = (
            np.asarray(t["cell_x"], dtype=np.int64) * 31
            + np.asarray(t["cell_y"], dtype=np.int64) * 7
            + np.asarray(t["salt"], dtype=np.int64)
        ) % num_shards
        return t.append_column("shard", pa.array(shard.astype(np.int32)))

    def pack_cells(group: pd.DataFrame) -> pd.DataFrame:
        packed = group.groupby(["cell_x", "cell_y", "salt"]).agg(
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
