"""Geo operators over the driver's testdata tables, with DuckDB oracles.

Coordinates derive deterministically from integer keys with arithmetic
that is expressible identically in SQL (Knuth multiplicative hash mod
2^32 → scaled to lon/lat), so the spatial operators — tile assignment,
point-in-polygon join, kNN, S2/H3 cell assignment — have exact oracles
(the S2 Hilbert walk runs as a 12-step recursive CTE in DuckDB). The
raster↔vector join over the interleaved corpus is rows-only here and
invariant-tested in pytest.

Float caution: both sides use IEEE doubles and the same operation order;
mercator-y goes through round(·, 9) before floor so a last-ulp libm
difference between numpy and DuckDB can't flip a tile boundary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

_A = 2654435761  # Knuth multiplicative hash constants
_B = 2246822519
_M = 4294967296


def derive_lonlat(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    k = keys.astype(np.int64)
    lon = ((k * _A) % _M) / _M * 360.0 - 180.0
    lat = ((k * _B) % _M) / _M * 170.0 - 85.0
    return lon, lat


_SQL_LON = f"((c_custkey * {_A}) % {_M}) / {_M} * 360 - 180"
_SQL_LAT = f"((c_custkey * {_B}) % {_M}) / {_M} * 170 - 85"


def q_geo_tile_assign(sf_dir: str):
    """Slippy-tile (z10) assignment for derived customer coordinates —
    the M9 cover operator with an exact SQL oracle."""
    ds = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])

    def assign(b: pa.Table) -> pa.Table:
        keys = np.asarray(b["c_custkey"], dtype=np.int64)
        lon, lat = derive_lonlat(keys)
        z = 10
        n = float(1 << z)
        x = np.floor(np.round((lon / 360.0 + 0.5) * n, 9)).astype(np.int64)
        s = np.sin(np.radians(lat))
        yv = (0.5 - np.log((1 + s) / (1 - s)) / (4 * np.pi)) * n
        y = np.floor(np.round(yv, 9)).astype(np.int64)
        x = np.clip(x, 0, (1 << z) - 1)
        y = np.clip(y, 0, (1 << z) - 1)
        zxy = [f"{z}/{xi}/{yi}" for xi, yi in zip(x, y)]
        return pa.table({
            "c_custkey": b["c_custkey"],
            "lon": pa.array(np.round(lon, 6)),
            "lat": pa.array(np.round(lat, 6)),
            "tile_x": pa.array(x),
            "tile_y": pa.array(y),
            "zxy": pa.array(zxy, type=pa.string()),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


SQL_GEO_TILE = f"""
WITH pts AS (
  SELECT c_custkey, {_SQL_LON} AS lon, {_SQL_LAT} AS lat FROM customer
), t AS (
  SELECT c_custkey, lon, lat,
    GREATEST(0, LEAST(1023, CAST(floor(round((lon / 360 + 0.5) * 1024, 9)) AS BIGINT))) AS tile_x,
    GREATEST(0, LEAST(1023, CAST(floor(round((0.5 - ln((1 + sin(radians(lat))) / (1 - sin(radians(lat)))) / (4 * pi())) * 1024, 9)) AS BIGINT))) AS tile_y
  FROM pts
)
SELECT c_custkey, round(lon, 6) AS lon, round(lat, 6) AS lat,
       tile_x, tile_y,
       '10/' || tile_x || '/' || tile_y AS zxy
FROM t
"""


def q_geo_pip_join(sf_dir: str):
    """Point-in-polygon join: derived customer points ⋈ a 10°-lattice of
    polygon cells. The Ray side runs the REAL even-odd PIP kernel over
    polygon geometry (geom/ops.py); the lattice alignment makes the
    result SQL-checkable."""
    from ..geom.ops import points_in_ring_bulk

    ds = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])

    # lattice cell polygons (36 x 17 cells of 10°x10°)
    cells = []
    for cx in range(36):
        for cy in range(17):
            w, s = -180.0 + cx * 10.0, -85.0 + cy * 10.0
            ring = np.array([[w, s], [w + 10, s], [w + 10, s + 10], [w, s + 10], [w, s]])
            cells.append((cx * 17 + cy, ring))

    def pip(b: pa.Table) -> pa.Table:
        keys = np.asarray(b["c_custkey"], dtype=np.int64)
        lon, lat = derive_lonlat(keys)
        pts = np.stack([lon, lat], axis=1)
        assigned = np.full(len(keys), -1, dtype=np.int64)
        for cell_id, ring in cells:
            # bbox prefilter, then the real ray-casting kernel
            w, s = ring[0]
            mask = (lon >= w) & (lon < w + 10) & (lat >= s) & (lat < s + 10)
            if mask.any():
                inside = points_in_ring_bulk(pts[mask], ring)
                idxs = np.flatnonzero(mask)[inside]
                assigned[idxs] = cell_id
        return pa.table({"c_custkey": b["c_custkey"], "cell_id": pa.array(assigned)})

    return (
        ds.map_batches(pip, batch_format="pyarrow")
        .groupby("cell_id")
        .count()
        .map_batches(lambda b: b.rename_columns(["cell_id", "n_points"]), batch_format="pyarrow")
    )


SQL_GEO_PIP = f"""
WITH pts AS (
  SELECT c_custkey, {_SQL_LON} AS lon, {_SQL_LAT} AS lat FROM customer
)
SELECT CAST(floor((lon + 180) / 10) * 17 + floor((lat + 85) / 10) AS BIGINT) AS cell_id,
       count(*) AS n_points
FROM pts
GROUP BY cell_id
"""


def q_geo_knn(sf_dir: str):
    """kNN proximity join: nearest supplier (haversine) per customer —
    the J5 operator with a broadcast small side and a SQL oracle."""
    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])
    skeys = np.asarray(sup["s_suppkey"], dtype=np.int64)
    slon, slat = derive_lonlat(skeys)

    ds = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])

    R = 6371.0088

    def nearest(b: pa.Table) -> pa.Table:
        keys = np.asarray(b["c_custkey"], dtype=np.int64)
        lon, lat = derive_lonlat(keys)
        lat1 = np.radians(lat)[:, None]
        lat2 = np.radians(slat)[None, :]
        dlat = lat2 - lat1
        dlon = np.radians(slon)[None, :] - np.radians(lon)[:, None]
        h = np.sin(dlat / 2) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2) ** 2
        d = 2 * R * np.arcsin(np.sqrt(h))
        best = np.argmin(d, axis=1)
        return pa.table({
            "c_custkey": b["c_custkey"],
            "nearest_supp": pa.array(skeys[best]),
            "dist_km": pa.array(np.round(d[np.arange(len(best)), best], 3)),
        })

    return ds.map_batches(nearest, batch_format="pyarrow")


SQL_GEO_KNN = f"""
WITH c AS (
  SELECT c_custkey, radians({_SQL_LON}) AS lon, radians({_SQL_LAT}) AS lat FROM customer
), s AS (
  SELECT s_suppkey,
         radians(((s_suppkey * {_A}) % {_M}) / {_M} * 360 - 180) AS lon,
         radians(((s_suppkey * {_B}) % {_M}) / {_M} * 170 - 85) AS lat
  FROM supplier
), d AS (
  SELECT c.c_custkey, s.s_suppkey,
         2 * 6371.0088 * asin(sqrt(
            sin((s.lat - c.lat) / 2) ^ 2 +
            cos(c.lat) * cos(s.lat) * sin((s.lon - c.lon) / 2) ^ 2
         )) AS dist
  FROM c CROSS JOIN s
)
SELECT c_custkey,
       arg_min(s_suppkey, dist) AS nearest_supp,
       round(min(dist), 3) AS dist_km
FROM d GROUP BY c_custkey
"""


def q_geo_cells(sf_dir: str):
    """S2 (level 12) + hex (r7-9) cell assignment for derived customer
    coords — vectorized bulk kernels, with a full SQL oracle: the hex
    binning is closed-form mercator arithmetic and the S2 Hilbert walk
    is a 12-step recursive CTE (level-12 ids depend only on the top 12
    bits of i/j, so 12 steps reproduce s2_cell exactly)."""
    from ..geom.cells import hex_cells, s2_cells

    ds = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])

    def assign(b: pa.Table) -> pa.Table:
        keys = np.asarray(b["c_custkey"], dtype=np.int64)
        lon, lat = derive_lonlat(keys)
        return pa.table({
            "c_custkey": b["c_custkey"],
            "s2_l12": pa.array(s2_cells(lon, lat, 12), type=pa.uint64()),
            "h3_r7": pa.array(hex_cells(lon, lat, 7), type=pa.uint64()),
            "h3_r8": pa.array(hex_cells(lon, lat, 8), type=pa.uint64()),
            "h3_r9": pa.array(hex_cells(lon, lat, 9), type=pa.uint64()),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


_HEX_EDGE = {7: 1.220629759, 8: 0.461354684, 9: 0.174375668}
_CIRC = 40075.016686


def _hex_ctes(res: int) -> str:
    """Closed-form mercator hex binning for one resolution, mirroring
    cells.hex_cell exactly: axial coords, cube rounding (floor(x+.5) —
    identical to numpy's half-even round off the measure-zero halves),
    the dx/dy/dz fix-up, and the res|q|r uint64 packing."""
    size = f"({_HEX_EDGE[res]!r} / {_CIRC!r})"
    return f"""h{res} AS (
  SELECT c_custkey, s2_l12,
    (sqrt(3)/3 * mx - my/3) / {size} AS q, (2.0/3 * my) / {size} AS r
  FROM merc
),
hround{res} AS (
  SELECT c_custkey, s2_l12, q, r,
    floor(q + 0.5) AS rx0, floor((-q - r) + 0.5) AS ry0, floor(r + 0.5) AS rz0
  FROM h{res}
),
hfix{res} AS (
  SELECT c_custkey,
    CASE WHEN abs(rx0-q) > abs(ry0-(-q-r)) AND abs(rx0-q) > abs(rz0-r)
         THEN -ry0-rz0 ELSE rx0 END AS rx1,
    ry0, rz0,
    NOT (abs(rx0-q) > abs(ry0-(-q-r)) AND abs(rx0-q) > abs(rz0-r))
        AND abs(ry0-(-q-r)) <= abs(rz0-r) AS fixz
  FROM hround{res}
),
hcell{res} AS (
  SELECT c_custkey,
    CAST(CAST({res} AS BIGINT) * 72057594037927936
         + ((CAST(rx1 AS BIGINT) & 268435455) * 268435456)
         + (CAST(CASE WHEN fixz THEN -rx1-ry0 ELSE rz0 END AS BIGINT) & 268435455)
       AS UBIGINT) AS h3_r{res}
  FROM hfix{res}
)"""


# The S2 oracle reproduces cells.s2_cell bit-for-bit: lonlat→xyz→face/uv
# →st are closed-form; only the top 12 bits of i/j reach a level-12 id
# (floor(st*4096) == floor(st*2^30) >> 18 exactly — multiplying a double
# by a power of two is exact), so the 30-step Hilbert walk collapses to a
# 12-step recursive CTE over a 16-row (orientation, ij)→(pos, xor) table.
SQL_GEO_CELLS = f"""
WITH RECURSIVE pts AS (
  SELECT c_custkey, {_SQL_LON} AS lon, {_SQL_LAT} AS lat FROM customer
),
xyz AS (
  SELECT c_custkey, lon, lat,
    cos(radians(lon)) * cos(radians(lat)) AS x,
    sin(radians(lon)) * cos(radians(lat)) AS y,
    sin(radians(lat)) AS z
  FROM pts
),
fuv AS (
  SELECT *, CASE
      WHEN abs(x) >= abs(y) AND abs(x) >= abs(z) THEN CASE WHEN x > 0 THEN 0 ELSE 3 END
      WHEN abs(y) >= abs(z) THEN CASE WHEN y > 0 THEN 1 ELSE 4 END
      ELSE CASE WHEN z > 0 THEN 2 ELSE 5 END END AS face
  FROM xyz
),
uv AS (
  SELECT *,
    CASE face WHEN 0 THEN y/x WHEN 1 THEN -x/y WHEN 2 THEN -x/z
              WHEN 3 THEN z/x WHEN 4 THEN z/y ELSE -y/z END AS u,
    CASE face WHEN 0 THEN z/x WHEN 1 THEN z/y WHEN 2 THEN -y/z
              WHEN 3 THEN y/x WHEN 4 THEN -x/y ELSE -x/z END AS v
  FROM fuv
),
stv AS (
  SELECT *,
    CASE WHEN u >= 0 THEN 0.5*sqrt(1+3*u) ELSE 1-0.5*sqrt(1-3*u) END AS su,
    CASE WHEN v >= 0 THEN 0.5*sqrt(1+3*v) ELSE 1-0.5*sqrt(1-3*v) END AS sv
  FROM uv
),
ij AS (
  SELECT c_custkey, lon, lat, face,
    GREATEST(0, LEAST(4095, CAST(floor(su * 4096) AS BIGINT))) AS i12,
    GREATEST(0, LEAST(4095, CAST(floor(sv * 4096) AS BIGINT))) AS j12
  FROM stv
),
hilbert(orient, ijb, p, oxor) AS (
  VALUES (0,0,0,1),(0,1,1,0),(0,2,3,3),(0,3,2,0),
         (1,0,0,1),(1,1,3,3),(1,2,1,0),(1,3,2,0),
         (2,0,2,0),(2,1,3,3),(2,2,1,0),(2,3,0,1),
         (3,0,2,0),(3,1,1,0),(3,2,3,3),(3,3,0,1)
),
walk AS (
  SELECT c_custkey, lon, lat, face, i12, j12, 11 AS k,
         face & 1 AS orient, CAST(0 AS BIGINT) AS pos
  FROM ij
  UNION ALL
  SELECT w.c_custkey, w.lon, w.lat, w.face, w.i12, w.j12, w.k - 1,
         xor(w.orient, h.oxor),
         (w.pos * 4) + h.p
  FROM walk w
  JOIN hilbert h
    ON h.orient = w.orient
   AND h.ijb = (((w.i12 >> w.k) & 1) * 2) | ((w.j12 >> w.k) & 1)
  WHERE w.k >= 0
),
s2 AS (
  SELECT c_custkey, lon, lat,
    CAST(CAST(face AS HUGEINT) * 2305843009213693952 + CAST(pos AS HUGEINT) * 137438953472
         + 68719476736 AS UBIGINT) AS s2_l12
  FROM walk WHERE k = -1
),
merc AS (
  SELECT c_custkey, s2_l12,
    (lon / 360 + 0.5) % 1.0 AS mx,
    0.5 - 0.25 * ln((1 + sin(radians(GREATEST(-85.0511287798066, LEAST(85.0511287798066, lat)))))
                  / (1 - sin(radians(GREATEST(-85.0511287798066, LEAST(85.0511287798066, lat)))))) / pi() AS my
  FROM s2
),
{",".join(_hex_ctes(res) for res in (7, 8, 9))}
SELECT s.c_custkey, s.s2_l12, a.h3_r7, b.h3_r8, c.h3_r9
FROM s2 s
JOIN hcell7 a USING (c_custkey)
JOIN hcell8 b USING (c_custkey)
JOIN hcell9 c USING (c_custkey)
"""


def q_raster_vector_join(sf_dir: str):
    """Raster↔vector join over the interleaved corpus: media cells table
    ⋈ feature covers by tile containment (scaled zoom equality). Returns
    (media_ref, doc_id, vector_doc) hit rows. Oracle: a DuckDB
    containment theta-join over the committed golden INPUT tables
    (goldens/raster_{media,covers}_sf0.01.parquet — deterministic
    seed-42 build outputs; see tools/make_goldens.py).

    Distributed plan (replaces the r1 all-pairs driver loop): tile
    containment across zooms means equality after projecting the finer
    tile to the coarser zoom, so for each distinct (media zoom, cover
    zoom) pair the finer side emits its ancestor cell at the coarser
    zoom, and the whole join is ONE bucketed `hash_join` on a packed
    (zoom, x, y) key. Probe fan-out per row = number of distinct zoom
    levels (a handful), never the cover count.

    Nothing index-sized touches the driver: the index is streaming-built
    to parquet, both join sides are `rd.read_parquet` column-pruned
    scans, and the only driver-resident values are the two distinct
    zoom-level sets (scalar metadata + a tiny distinct aggregate)."""
    from ..index.build import load_index_meta
    from ..ops.joins import hash_join
    from ..pipelines.flagship import (
        build_corpus_and_index_streaming,
        corpus_scale_for,
    )

    _, index_dir = build_corpus_and_index_streaming(
        scale=corpus_scale_for(sf_dir), load=False)

    # distinct zoom sets: scalars from index metadata (covers index at
    # the per-layer zoom) + one tiny distinct aggregate for media zooms
    meta = load_index_meta(index_dir)
    cover_zooms = sorted(set(int(z) for z in meta["layer_zooms"].values()))
    media_raw = rd.read_parquet(f"{index_dir}/mediacells",
                                columns=["doc_id", "media_ref", "zxy"])
    mz_df = (
        media_raw.select_columns(["zxy"])
        .map_batches(
            lambda df: pd.DataFrame(
                {"mz": df["zxy"].str.split("/").str[0].astype(int).unique()}),
            batch_format="pandas")
        .to_pandas()
    )
    media_zooms = sorted(set(mz_df["mz"].tolist()))

    def key(role, z, x, y):
        # role bit separates the two containment directions so a media
        # ANCESTOR can never meet a cover ANCESTOR (cousins sharing a
        # coarse cell are not contained in each other):
        #   role 0: media ancestor  ⋈ cover own-cell   (cover ⊇ media)
        #   role 1: media own-cell  ⋈ cover ancestor   (media ⊇ cover)
        return (np.int64(role) << np.int64(62)) | \
               (np.asarray(z, dtype=np.int64) << 58) | \
               (np.asarray(x, dtype=np.int64) << 29) | np.asarray(y, dtype=np.int64)

    def media_probes(df: pd.DataFrame) -> pd.DataFrame:
        zxy = df["zxy"].str.split("/", expand=True).astype(int)
        df = df.assign(mz=zxy[0], mx=zxy[1], my=zxy[2])
        outs = []
        for cz in cover_zooms:
            m = df[df["mz"] >= cz]
            if m.empty:
                continue
            shift = (m["mz"] - cz).to_numpy()
            outs.append(pd.DataFrame({
                "k": key(0, cz, m["mx"].to_numpy() >> shift, m["my"].to_numpy() >> shift),
                "media_ref": m["media_ref"].to_numpy(),
                "media_doc": m["doc_id"].to_numpy(),
            }))
        finer_exists = df["mz"].map(lambda z: any(cz > z for cz in cover_zooms))
        own = df[finer_exists]
        if not own.empty:
            outs.append(pd.DataFrame({
                "k": key(1, own["mz"].to_numpy(), own["mx"].to_numpy(), own["my"].to_numpy()),
                "media_ref": own["media_ref"].to_numpy(),
                "media_doc": own["doc_id"].to_numpy(),
            }))
        return pd.concat(outs, ignore_index=True) if outs else pd.DataFrame(
            {"k": [], "media_ref": [], "media_doc": []})

    def cover_probes(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["layer", "zoom", "x", "y", "fid"])
        outs = [pd.DataFrame({
            "k": key(0, df["zoom"].to_numpy(), df["x"].to_numpy(), df["y"].to_numpy()),
            "vector_doc_fid": df["fid"].to_numpy(),
            "vector_layer": df["layer"].to_numpy(),
        })]
        for mz in media_zooms:
            m = df[df["zoom"] > mz]
            if m.empty:
                continue
            shift = (m["zoom"] - mz).to_numpy()
            outs.append(pd.DataFrame({
                "k": key(1, mz, m["x"].to_numpy() >> shift, m["y"].to_numpy() >> shift),
                "vector_doc_fid": m["fid"].to_numpy(),
                "vector_layer": m["layer"].to_numpy(),
            }))
        return pd.concat(outs, ignore_index=True).drop_duplicates()

    media_ds = media_raw.map_batches(media_probes, batch_format="pandas")
    covers_ds = rd.read_parquet(
        f"{index_dir}/phrasegrid", columns=["layer", "zoom", "x", "y", "fid"]
    ).map_batches(cover_probes, batch_format="pandas")

    joined = hash_join(media_ds, covers_ds, on="k", how="inner")
    return joined.map_batches(
        lambda df: df[["media_ref", "media_doc", "vector_doc_fid", "vector_layer"]]
        .drop_duplicates(),
        batch_format="pandas",
    )


GEO_QUERIES = {
    "geo_tile_assign": q_geo_tile_assign,
    "geo_pip_join": q_geo_pip_join,
    "geo_knn": q_geo_knn,
    "geo_cells": q_geo_cells,
    "raster_vector_join": q_raster_vector_join,
}

# The raster↔vector oracle re-derives the multi-zoom tile-containment
# join as a declarative theta-join (DuckDB blockwise-NL on the bit-shift
# predicate) over the committed golden INPUT tables — the deterministic
# seed-42 index-build outputs the Ray plan consumes (tools/
# make_goldens.py regenerates them). The Ray side builds the same inputs
# live via the streaming index build, so a build drift OR a join-logic
# drift both surface as a hash mismatch. Paths are absolute because the
# driver runs the SQL from its own cwd at sf0.01.
SQL_RASTER_VECTOR = """
SELECT DISTINCT m.media_ref AS media_ref, m.doc_id AS media_doc,
       c.fid AS vector_doc_fid, c.layer AS vector_layer
FROM read_parquet('/root/repo/goldens/raster_media_sf0.01.parquet') m
JOIN read_parquet('/root/repo/goldens/raster_covers_sf0.01.parquet') c
  ON (m.mz >= c.zoom AND (m.mx >> (m.mz - c.zoom)) = c.x
                     AND (m.my >> (m.mz - c.zoom)) = c.y)
  OR (c.zoom > m.mz AND (c.x >> (c.zoom - m.mz)) = m.mx
                    AND (c.y >> (c.zoom - m.mz)) = m.my)
"""

GEO_ORACLES = {
    "geo_tile_assign": SQL_GEO_TILE,
    "geo_pip_join": SQL_GEO_PIP,
    "geo_knn": SQL_GEO_KNN,
    "geo_cells": SQL_GEO_CELLS,
    "raster_vector_join": SQL_RASTER_VECTOR,
}
