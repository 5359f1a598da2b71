"""Staged forward-geocode pipeline — the sharded scale path.

The fused actor (engine.ForwardGeocoder) holds the whole index per
actor; that stops working when a layer's phrase/grid tables outgrow one
worker. This variant is the SURVEY.md §3.2 Ray shape with the explicit
shuffle:

    queries → mB-actor(PhrasematchStage: phrase windows → grid rows)
            → groupby(query_id)                      # the shuffle
            → map_groups(coalesce: stack+rebalance+topk, pure python)
            → mB-actor(VerifyStage: feature hydrate + context + format)

Forward queries only — reverse/id queries route through the fused
actor (engine.ForwardGeocoder), which is also the fast path when the
index fits an actor.

Stage boundaries carry narrow Arrow rows: grids packed with the 53-bit
grid encoding (util/grid.py) — exactly what a phrase-sharded cluster
would exchange. PhrasematchStage actors can then hold only a
prefix-bin shard of the phrase table (shard_of_n constructor arg), with
queries fanned out to every shard and the groupby(query_id) shuffle
re-assembling per-query state — no actor ever needs the whole index.

Proximity note: stage-2 scoredist uses the tile-corner distance (the
feature center isn't hydrated yet); stage 3 recomputes the precise
scoredist before the final sort, so final ordering matches the fused
path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import constants
from ..util import grid as gridmod
from ..util.jsmath import round_to
from .coalesce import Grid, Phrasematch, stack_and_coalesce
from .engine import (
    RESULT_FIELDS,
    RESULT_SCHEMA,
    IndexData,
    _context_for,
    phrasematch_query,
    query_hypotheses,
    resolve_address,
)

PM_SCHEMA = pa.schema([
    ("query_id", pa.string()),
    ("query_len", pa.int32()),
    ("proximity_lon", pa.float64()),
    ("proximity_lat", pa.float64()),
    ("limit", pa.int32()),
    ("idx", pa.int32()),
    ("layer", pa.string()),
    ("zoom", pa.int32()),
    ("mask", pa.int64()),
    ("weight", pa.float64()),
    ("prefix", pa.bool_()),
    ("address", pa.string()),
    ("grids", pa.list_(pa.uint64())),      # 53-bit packed (x,y,relev,score3,fid)
    ("grid_scores", pa.list_(pa.float64())),  # raw scores (decoded path)
])


class PhrasematchStage:
    """Actor: queries → phrasematch rows. Holds only the phrase/grid
    table (optionally one prefix-bin shard via shard/of_n)."""

    def __init__(self, features, phrase_grid, freq, max_score, layer_zooms,
                 config=None, shard: int = 0, of_n: int = 1):
        if of_n > 1:
            pids = np.asarray(phrase_grid["phrase_id"], dtype=np.int64) >> 40
            phrase_grid = phrase_grid.filter(pa.array(pids % of_n == shard))
        self.index = IndexData(features, phrase_grid, freq, max_score,
                               layer_zooms, config=config)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = batch.column_names
        queries = batch["query"].to_pylist()
        qids = batch["query_id"].to_pylist() if "query_id" in cols else [str(i) for i in range(len(queries))]
        plon = batch["proximity_lon"].to_pylist() if "proximity_lon" in cols else [None] * len(queries)
        plat = batch["proximity_lat"].to_pylist() if "proximity_lat" in cols else [None] * len(queries)
        lims = batch["limit"].to_pylist() if "limit" in cols else [5] * len(queries)

        from ..text.termops import num_tokenize
        from ..text.token_replacer import replace_global_tokens
        from ..text.tokenize import normalize_query, tokenize

        rows = {name: [] for name in PM_SCHEMA.names}
        for qid, q, lo, la, lim in zip(qids, queries, plon, plat, lims):
            if self.index.global_rules:
                q = replace_global_tokens(self.index.global_rules, q)
            tokens = normalize_query(tokenize(q)).tokens[: constants.MAX_QUERY_TOKENS]
            if self.index.simple:
                tokens = self.index.simple.replace(tokens)
            if not tokens:
                continue
            pms: list[Phrasematch] = []
            tried: set = set()
            for hyp, penalty in query_hypotheses(self.index, tokens, fuzzy=True):
                if len(hyp) != len(tokens):
                    continue
                pms.extend(phrasematch_query(self.index, hyp, weight_multiplier=penalty, seen=tried))
            for var_tokens, addr in num_tokenize(tokens):
                pms.extend(phrasematch_query(self.index, var_tokens, seen=tried,
                                             address=addr["number"]))
                if addr["position"] > 0:
                    swapped = [var_tokens[addr["position"]]] + [
                        t for i, t in enumerate(var_tokens) if i != addr["position"]]
                    pms.extend(phrasematch_query(self.index, swapped, weight_multiplier=0.99,
                                                 seen=tried, address=addr["number"]))
            for pm in pms:
                rows["query_id"].append(qid)
                rows["query_len"].append(len(tokens))
                rows["proximity_lon"].append(lo)
                rows["proximity_lat"].append(la)
                rows["limit"].append(int(lim) if lim is not None else 5)
                rows["idx"].append(pm.idx)
                rows["layer"].append(pm.layer)
                rows["zoom"].append(pm.zoom)
                rows["mask"].append(pm.mask)
                rows["weight"].append(pm.weight)
                rows["prefix"].append(pm.prefix)
                rows["address"].append(pm.address)
                packed = gridmod.encode(
                    [g.x for g in pm.grids], [g.y for g in pm.grids],
                    [g.relev for g in pm.grids],
                    [0] * len(pm.grids),  # score3 re-derived at verify
                    [g.fid for g in pm.grids],
                )
                rows["grids"].append(packed.tolist())
                rows["grid_scores"].append([g.score for g in pm.grids])
        return pa.table({n: pa.array(rows[n], type=PM_SCHEMA.field(n).type) for n in PM_SCHEMA.names})


def coalesce_shard(shard_group):
    """One shuffle group per query-id shard; exact per-query coalesce is
    pandas-grouped inside (the coarse-shard pattern from ops/agg)."""
    import pandas as pd

    outs = [coalesce_group(g) for _, g in shard_group.groupby("query_id", sort=False)]
    outs = [o for o in outs if len(o)]
    if not outs:
        return pd.DataFrame()
    return pd.concat(outs, ignore_index=True).drop(columns=["__qshard"], errors="ignore")


def coalesce_group(group):
    """Pure per-query coalesce: rebuild phrasematches from packed rows,
    stack, emit the top stacks as narrow rows."""
    import pandas as pd

    from ..util.proximity import distance as prox_distance, scoredist as prox_scoredist

    if len(group) == 0:
        return pd.DataFrame()
    qid = group["query_id"].iloc[0]
    qlen = int(group["query_len"].iloc[0])
    plon = group["proximity_lon"].iloc[0]
    plat = group["proximity_lat"].iloc[0]
    lim = int(group["limit"].iloc[0])
    has_prox = plon is not None and not pd.isna(plon)

    pms = []
    for r in group.itertuples():
        dec = gridmod.decode(np.asarray(r.grids, dtype=np.uint64))
        grids = []
        for i in range(len(r.grids)):
            g = Grid(
                x=int(dec["x"][i]), y=int(dec["y"][i]), relev=float(dec["relev"][i]),
                score=float(r.grid_scores[i]), fid=int(dec["id"][i]),
                tmpid=int(r.idx) * (1 << 25) + int(dec["id"][i]),
            )
            if has_prox:
                # tile-center distance (feature center hydrates in stage 3)
                from ..geom.tile import tile_center_lonlat

                clon, clat = tile_center_lonlat(g.x, g.y, int(r.zoom))
                g.distance = float(prox_distance((plon, plat), (float(clon), float(clat)),
                                                 g.x, g.y, int(r.zoom)))
                g.scoredist = float(prox_scoredist(g.score, 0.0, 1000.0, g.distance, int(r.zoom)))
            else:
                g.scoredist = g.score
            grids.append(g)
        pms.append(Phrasematch(
            idx=int(r.idx), layer=str(r.layer), zoom=int(r.zoom), mask=int(r.mask),
            weight=float(r.weight), subquery="", phrase_id=0,
            prefix=bool(r.prefix), grids=grids,
            address=r.address if isinstance(r.address, str) else None,
        ))

    stacks = stack_and_coalesce(pms, qlen)
    out = {
        "query_id": [], "limit": [], "proximity_lon": [], "proximity_lat": [],
        "relev": [], "top_tmpid": [], "top_zoom": [], "address": [],
        "scoredist0": [], "n_covers": [],
    }
    for st in stacks[: constants.VERIFYMATCH_STACK_LIMIT]:
        covers = st.covers()
        out["query_id"].append(qid)
        out["limit"].append(lim)
        out["proximity_lon"].append(plon if has_prox else None)
        out["proximity_lat"].append(plat if has_prox else None)
        out["relev"].append(st.relev)
        out["top_tmpid"].append(covers[0].grid.tmpid)
        out["top_zoom"].append(covers[0].pm.zoom)
        out["address"].append(next((e.pm.address for e in covers if e.pm.address), None))
        out["scoredist0"].append(covers[0].grid.scoredist)
        out["n_covers"].append(len(covers))
    return pd.DataFrame(out)


class VerifyStage:
    """Actor: stack rows → final result rows (feature hydrate + precise
    proximity scoredist + context + dedupe + format). Holds the feature
    table only — at scale, sharded by hash(fid) with a second groupby."""

    def __init__(self, features, phrase_grid, freq, max_score, layer_zooms, config=None):
        # phrase table not needed here; pass a minimal empty grid table
        self.index = IndexData(features, phrase_grid.slice(0, 0), freq, max_score,
                               layer_zooms, config=config)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        from ..geom.cells import hex_cell, s2_cell
        from ..geom.tile import lonlat_to_tile
        from ..util import proximity as prox

        df = batch.to_pandas()
        rows = {name: [] for name, _ in RESULT_FIELDS}
        for qid, g in df.groupby("query_id", sort=False):
            g = g.sort_values(["relev", "scoredist0"], ascending=[False, False], kind="mergesort")
            lim = int(g["limit"].iloc[0])
            best: dict[int, dict] = {}
            for r in g.itertuples():
                frow = self.index.row_by_tmpid(int(r.top_tmpid))
                if frow is None:
                    continue
                feature = self.index.feature_at(frow)
                ctx = _context_for(self.index, frow, int(feature.idx))
                addr_number = r.address if isinstance(r.address, str) else None
                resolved = resolve_address(feature, addr_number) if addr_number else None
                matched_address = resolved["address"] if resolved else None
                lon = resolved["lon"] if resolved else float(feature.center_lon)
                lat = resolved["lat"] if resolved else float(feature.center_lat)
                has_prox = r.proximity_lon is not None and not pd.isna(r.proximity_lon)
                if has_prox:
                    zoom = int(r.top_zoom)
                    tx, ty = lonlat_to_tile(lon, lat, zoom)
                    d = prox.distance((r.proximity_lon, r.proximity_lat), (lon, lat),
                                      int(tx), int(ty), zoom)
                    scoredist = float(prox.scoredist(float(feature.score), 0.0,
                                                     self.index.max_score, d, zoom))
                else:
                    scoredist = float(feature.score)
                name_prefix = f"{matched_address} " if matched_address else ""
                place_name = name_prefix + ", ".join([feature.text] + [c.text for c in ctx])
                relevance = round_to(float(r.relev), 6)
                ghost = float(feature.score) < 0
                composite = prox.relevance_score(
                    relevance, scoredist if has_prox else 1.0,
                    address=matched_address if addr_number else "n/a", ghost=ghost)
                zoom = int(feature.zoom)
                tx, ty = lonlat_to_tile(lon, lat, zoom)
                cand = ({
                    "feature_id": feature.doc_id, "relevance": relevance,
                    "composite": composite, "place_name": place_name,
                    "center_lon": lon, "center_lat": lat,
                    "cell_zxy": f"{zoom}/{int(tx)}/{int(ty)}",
                    "h3_r7": hex_cell(lon, lat, 7), "h3_r8": hex_cell(lon, lat, 8),
                    "h3_r9": hex_cell(lon, lat, 9), "s2_cell": s2_cell(lon, lat, 12),
                    "context": [c.doc_id for c in ctx],
                    "score": float(feature.score), "scoredist": scoredist,
                    "idx": int(feature.idx), "fid": int(feature.fid),
                    "address": matched_address,
                    "routable_lon": None, "routable_lat": None,
                    "place_name": place_name,
                })
                prev = best.get(int(r.top_tmpid))
                if prev is None or (cand["relevance"], cand["composite"]) > (
                        prev["relevance"], prev["composite"]):
                    best[int(r.top_tmpid)] = cand
            # place-name dedup after best-per-feature (matches fused path)
            results = []
            seen_names: set[str] = set()
            for cand in sorted(best.values(), key=lambda x: (
                    -x["relevance"], -x["composite"], -x["scoredist"], x["idx"], x["fid"])):
                if cand["place_name"] in seen_names:
                    continue
                seen_names.add(cand["place_name"])
                results.append(cand)
            results.sort(key=lambda x: (
                -x["relevance"], -x["composite"], -x["scoredist"], x["idx"], x["fid"]))
            for rank, res in enumerate(results[:lim]):
                rows["query_id"].append(qid)
                res["rank"] = rank
                for name, _ in RESULT_FIELDS[1:]:
                    rows[name].append(res.get(name))
        return pa.table({name: pa.array(rows[name], type=t) for name, t in RESULT_FIELDS})


def forward_geocode_staged(queries_ds, index, concurrency: int = 4, config=None,
                           phrase_shards: int = 1):
    """The three-stage pipeline with the explicit per-query shuffle."""
    feats = index.features
    if "spans" in feats.column_names:
        feats = feats.drop_columns(["spans"])
    kwargs = {
        "features": feats, "phrase_grid": index.phrase_grid,
        "freq": index.freq, "max_score": index.max_score,
        "layer_zooms": index.layer_zooms, "config": config,
    }
    pm_rows = queries_ds.map_batches(
        PhrasematchStage, fn_constructor_kwargs=kwargs,
        batch_format="pyarrow", batch_size=256, concurrency=(1, concurrency) if isinstance(concurrency, int) else concurrency,
    )

    def add_qshard(df):
        import pandas as pd

        df = df.copy()
        df["__qshard"] = (
            pd.util.hash_pandas_object(df["query_id"], index=False).to_numpy() % 64
        ).astype("int32")
        return df

    stacks = (
        pm_rows.map_batches(add_qshard, batch_format="pandas")
        .groupby("__qshard")
        .map_groups(coalesce_shard, batch_format="pandas")
    )
    return stacks.map_batches(
        VerifyStage, fn_constructor_kwargs=kwargs,
        batch_format="pyarrow", batch_size=512, concurrency=max(1, concurrency // 2),
    )
