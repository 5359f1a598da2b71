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
    ("phashes", pa.list_(pa.int64())),     # per-grid source text hash
    ("max_score", pa.float64()),           # index max_score, carried so the
                                           # coalesce stage (no index access)
                                           # normalizes scoredist identically
                                           # to the fused path
    ("subquery", pa.string()),             # matched subquery text — the
                                           # direction-effects walk compares
                                           # adjacent cover texts
    ("ignore_order", pa.bool_()),          # layer's geocoder_ignore_order
    ("ndx", pa.int32()),                   # dense layer rank (gap penalty)
])

# one row PER QUERY leaving coalesce: each column is a list over the
# query's candidate stacks (cover_tmpids flattened with cover_counts
# giving per-stack lengths). Packing per query means a downstream
# map_batches boundary can never split one query's stacks across two
# verify batches (which duplicated rank-0 rows).
STACK_SCHEMA = pa.schema([
    ("query_id", pa.string()),
    ("limit", pa.int32()),
    ("proximity_lon", pa.float64()),
    ("proximity_lat", pa.float64()),
    ("relev", pa.list_(pa.float64())),      # post direction-effects, unrounded
    ("tmpid", pa.list_(pa.int64())),        # top cover's grid tmpid
    ("zoom", pa.list_(pa.int32())),         # top cover's pm zoom
    ("gx", pa.list_(pa.int32())),           # top cover's grid x
    ("gy", pa.list_(pa.int32())),           # top cover's grid y
    ("gscore", pa.list_(pa.float64())),     # top cover's grid score
    ("address", pa.list_(pa.string())),
    ("sd0", pa.list_(pa.float64())),        # stage-2 scoredist (determinism sort)
    ("top_subquery", pa.list_(pa.string())),  # matching_text derivation
    ("top_phash", pa.list_(pa.int64())),      # source text hash of top cover
    ("cover_tmpids", pa.list_(pa.int64())),
    ("cover_counts", pa.list_(pa.int32())),
    # parallel to cover_tmpids — the close-but-no-cigar context walk
    ("cover_idxs", pa.list_(pa.int32())),
    ("cover_zooms", pa.list_(pa.int32())),
    ("cover_sublens", pa.list_(pa.int32())),
    ("cover_masks", pa.list_(pa.int64())),
    ("cover_relevs", pa.list_(pa.float64())),
])


from dataclasses import dataclass as _dataclass


@_dataclass(slots=True)
class _PackedRow:
    """One phrasematch as exchange-ready packed data. Quacks like a
    Phrasematch for filter_misspelled_short (subquery/mask/edit_distance)."""

    idx: int
    layer: str
    zoom: int
    mask: int
    weight: float
    prefix: bool
    address: str | None
    grids: list
    grid_scores: list
    phashes: list
    subquery: str
    edit_distance: int
    ndx: int


class PackedCollector:
    """phrasematch_query collector that packs grid slices straight from
    the numpy phrase-grid columns — no Grid/Phrasematch objects, no
    re-encode (that was ~40% of staged phrasematch time)."""

    def __init__(self):
        self.entries: list[_PackedRow] = []

    def emit(self, index, idx, rel, mask, weight, joined, use_prefix,
             address, edit_distance):
        c = index.pg_cols
        packed = gridmod.encode(
            c["x"][rel], c["y"][rel], c["relev"][rel],
            np.zeros(len(rel), dtype=np.int64),  # score3 re-derived at verify
            c["fid"][rel],
        )
        phashes = c.get("phash")
        self.entries.append(_PackedRow(
            idx=int(idx), layer=str(c["layer"][rel[0]]),
            zoom=int(c["zoom"][rel[0]]), mask=mask, weight=weight,
            prefix=use_prefix, address=address,
            grids=packed.tolist(),
            grid_scores=c["score"][rel].tolist(),
            phashes=(phashes[rel].tolist() if phashes is not None else [0] * len(rel)),
            subquery=joined, edit_distance=edit_distance,
            ndx=index.idx_rank.get(int(idx), int(idx)),
        ))


class PhrasematchStage:
    """Actor: queries → phrasematch rows. Holds only the phrase/grid
    table (optionally one prefix-bin shard via shard/of_n)."""

    def __init__(self, features, phrase_grid, freq, max_score, layer_zooms,
                 config=None, shard: int = 0, of_n: int = 1):
        if of_n > 1:
            pids = np.asarray(phrase_grid["phrase_id"], dtype=np.int64) >> 40
            phrase_grid = phrase_grid.filter(pa.array(pids % of_n == shard))
        self.index = IndexData(features, phrase_grid, freq, max_score,
                               layer_zooms, config=config, presorted=True)

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
        from .engine import filter_misspelled_short

        rows = {name: [] for name in PM_SCHEMA.names}
        for qid, q, lo, la, lim in zip(qids, queries, plon, plat, lims):
            if self.index.global_rules:
                q = replace_global_tokens(self.index.global_rules, q)
            tokens = normalize_query(tokenize(q)).tokens[: constants.MAX_QUERY_TOKENS]
            if self.index.simple:
                tokens = self.index.simple.replace(tokens)
            if not tokens:
                continue
            col = PackedCollector()
            tried: set = set()
            fz = 1 if len(tokens) <= constants.MAX_CORRECTION_LENGTH else 0
            for hyp, penalty in query_hypotheses(self.index, tokens, fuzzy=False):
                if len(hyp) != len(tokens):
                    continue
                phrasematch_query(self.index, hyp, weight_multiplier=penalty,
                                  seen=tried, fuzzy_max_distance=fz, collector=col)
            for var_tokens, addr in num_tokenize(tokens):
                phrasematch_query(self.index, var_tokens, seen=tried,
                                  address=addr["number"], collector=col,
                                  fuzzy_max_distance=fz)
                if addr["position"] > 0:
                    swapped = [var_tokens[addr["position"]]] + [
                        t for i, t in enumerate(var_tokens) if i != addr["position"]]
                    phrasematch_query(self.index, swapped, weight_multiplier=0.99,
                                      seen=tried, address=addr["number"], collector=col,
                                      fuzzy_max_distance=fz)

            pms = filter_misspelled_short(col.entries)
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
                rows["grids"].append(pm.grids)
                rows["grid_scores"].append(pm.grid_scores)
                rows["phashes"].append(pm.phashes)
                rows["max_score"].append(self.index.max_score)
                rows["subquery"].append(pm.subquery)
                rows["ignore_order"].append(pm.layer in self.index.ignore_order_layers)
                rows["ndx"].append(pm.ndx)
        return pa.table({n: pa.array(rows[n], type=PM_SCHEMA.field(n).type) for n in PM_SCHEMA.names})


def coalesce_shard(shard_group):
    """One shuffle group per query-id shard; exact per-query coalesce is
    pandas-grouped inside (the coarse-shard pattern from ops/agg).
    Returns an Arrow table in STACK_SCHEMA (one row per query)."""
    rows = {n: [] for n in STACK_SCHEMA.names}
    # one numpy extraction for the whole shard, then per-query slices —
    # pandas scalar .iloc/.itertuples dominated this stage before
    cols = {c: shard_group[c].to_numpy() for c in shard_group.columns}
    qids = cols["query_id"]
    order = np.argsort(qids, kind="mergesort")
    sorted_qids = qids[order]
    bounds = np.flatnonzero(np.concatenate(
        [[True], sorted_qids[1:] != sorted_qids[:-1]]))
    bounds = np.append(bounds, len(sorted_qids))
    for b in range(len(bounds) - 1):
        sel = order[bounds[b]:bounds[b + 1]]
        coalesce_group({c: v[sel] for c, v in cols.items()}, rows)
    return pa.table({n: pa.array(rows[n], type=STACK_SCHEMA.field(n).type)
                     for n in STACK_SCHEMA.names})


def coalesce_group(col: dict, rows) -> None:
    """Pure per-query coalesce: rebuild phrasematches from packed rows,
    stack, apply the direction effects (verifymatch.js:847-933 — covers
    carry mask+subquery, all present here), append ONE row of
    stack-lists for the query. `col` is a dict of numpy column slices
    for one query's pm rows."""
    import pandas as pd

    from .engine import _direction_effects

    n_rows = len(col["query_id"])
    if n_rows == 0:
        return
    qid = col["query_id"][0]
    qlen = int(col["query_len"][0])
    plon = col["proximity_lon"][0]
    plat = col["proximity_lat"][0]
    lim = int(col["limit"][0])
    has_prox = plon is not None and not pd.isna(plon)

    # decode every pm row, then run the proximity math ONCE over all of
    # the query's grids concatenated (avg pm row holds <10 grids — both
    # per-grid scalar calls and per-row numpy were overhead-bound)
    zooms_col = col["zoom"]
    decoded = []
    for i in range(n_rows):
        dec = gridmod.decode(np.asarray(col["grids"][i], dtype=np.uint64))
        decoded.append((i, dec, np.asarray(col["grid_scores"][i], dtype=np.float64)))

    if has_prox and decoded:
        from ..util.proximity import haversine_miles, scale_radius, score_weight

        all_x = np.concatenate([d["x"].astype(np.float64) for _, d, _ in decoded])
        all_y = np.concatenate([d["y"].astype(np.float64) for _, d, _ in decoded])
        all_n = np.concatenate([
            np.full(len(d["x"]), 2.0 ** int(zooms_col[i])) for i, d, _ in decoded])
        all_scores = np.concatenate([s for _, _, s in decoded])
        all_zoom = np.concatenate([
            np.full(len(d["x"]), int(zooms_col[i]), dtype=np.int64) for i, d, _ in decoded])
        max_score = float(col["max_score"][0])  # constant per index
        clon = (all_x + 0.5) / all_n * 360.0 - 180.0
        clat = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * (all_y + 0.5) / all_n))))
        best = haversine_miles(plon, plat, clon, clat)
        max_corner = np.zeros(len(all_x))
        for dx in (0.0, 1.0):
            for dy in (0.0, 1.0):
                lon_c = (all_x + dx) / all_n * 360.0 - 180.0
                lat_c = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * (all_y + dy) / all_n))))
                max_corner = np.maximum(max_corner, haversine_miles(plon, plat, lon_c, lat_c))
        all_dist = np.minimum(best, max_corner)
        # scoredist = dist_weight × score_weight; dist_weight depends on
        # the per-row zoom through scale_radius (piecewise) — vectorize
        # by mapping zoom→radius then one gauss pass
        from ..util.proximity import _VARIANCE_CONSTANT, gauss

        radii = np.array([scale_radius(int(z)) for z in (6, 12, 14)])
        r_sel = np.where(all_zoom <= 6, radii[0], np.where(all_zoom <= 12, radii[1], radii[2]))
        dist_w = 9.0 * gauss(all_dist / r_sel * 3.0, _VARIANCE_CONSTANT) + 1.0
        all_sd = dist_w * score_weight(all_scores, 0.0, max_score)
    else:
        all_dist = all_sd = None

    pms = []
    off = 0
    for i, dec, scores in decoded:
        m = len(dec["x"])
        if has_prox:
            dists = all_dist[off:off + m]
            sds = all_sd[off:off + m]
        else:
            dists = np.zeros(m)
            sds = scores
        off += m
        idx_base = int(col["idx"][i]) * (1 << 25)
        addr_v = col["address"][i]
        grids = [
            Grid(x=x, y=y, relev=rv, score=sc, fid=fd, tmpid=idx_base + fd,
                 distance=dv, scoredist=sv, phash=ph)
            for x, y, rv, sc, fd, dv, sv, ph in zip(
                dec["x"].tolist(), dec["y"].tolist(), dec["relev"].tolist(),
                scores.tolist(), dec["id"].tolist(), dists.tolist(),
                np.asarray(sds).tolist(), list(col["phashes"][i]))
        ]
        pms.append(Phrasematch(
            idx=int(col["idx"][i]), layer=str(col["layer"][i]),
            zoom=int(zooms_col[i]), mask=int(col["mask"][i]),
            weight=float(col["weight"][i]), subquery=str(col["subquery"][i]),
            phrase_id=0, prefix=bool(col["prefix"][i]), grids=grids,
            address=addr_v if isinstance(addr_v, str) else None,
        ))

    io_mask = col["ignore_order"].astype(bool)
    ignore_layers = frozenset(str(l) for l in col["layer"][io_mask])
    idx_rank = {int(i): int(n) for i, n in zip(col["idx"], col["ndx"])}
    stacks = stack_and_coalesce(
        pms, qlen, idx_rank=idx_rank)[: constants.VERIFYMATCH_STACK_LIMIT]
    if not stacks:
        return
    relevs, tmpids, zooms, gxs, gys, gscores, addrs, sd0s, subs, phs = \
        [], [], [], [], [], [], [], [], [], []
    cov_flat: list[int] = []
    cov_counts: list[int] = []
    cov_idx: list[int] = []
    cov_zoom: list[int] = []
    cov_sublen: list[int] = []
    cov_mask: list[int] = []
    cov_relev: list[float] = []
    for st in stacks:
        covers = st.covers()
        relevs.append(_direction_effects(covers, st.relev, ignore_layers))
        tmpids.append(covers[0].grid.tmpid)
        zooms.append(covers[0].pm.zoom)
        gxs.append(covers[0].grid.x)
        gys.append(covers[0].grid.y)
        gscores.append(covers[0].grid.score)
        addrs.append(next((e.pm.address for e in covers if e.pm.address), None))
        sd0s.append(covers[0].grid.scoredist)
        subs.append(covers[0].pm.subquery)
        phs.append(covers[0].grid.phash)
        cov_flat.extend(e.grid.tmpid for e in covers)
        cov_counts.append(len(covers))
        cov_idx.extend(e.pm.idx for e in covers)
        cov_zoom.extend(e.pm.zoom for e in covers)
        cov_sublen.extend(len(e.pm.subquery) for e in covers)
        cov_mask.extend(e.pm.mask for e in covers)
        cov_relev.extend(e.relev for e in covers)
    rows["query_id"].append(qid)
    rows["limit"].append(lim)
    rows["proximity_lon"].append(plon if has_prox else None)
    rows["proximity_lat"].append(plat if has_prox else None)
    rows["relev"].append(relevs)
    rows["tmpid"].append(tmpids)
    rows["zoom"].append(zooms)
    rows["gx"].append(gxs)
    rows["gy"].append(gys)
    rows["gscore"].append(gscores)
    rows["address"].append(addrs)
    rows["sd0"].append(sd0s)
    rows["top_subquery"].append(subs)
    rows["top_phash"].append(phs)
    rows["cover_tmpids"].append(cov_flat)
    rows["cover_counts"].append(cov_counts)
    rows["cover_idxs"].append(cov_idx)
    rows["cover_zooms"].append(cov_zoom)
    rows["cover_sublens"].append(cov_sublen)
    rows["cover_masks"].append(cov_mask)
    rows["cover_relevs"].append(cov_relev)


class VerifyStage:
    """Actor: stack rows → final result rows (feature hydrate + precise
    proximity scoredist + context + dedupe + format). Holds the feature
    table only — at scale, sharded by hash(fid) with a second groupby."""

    def __init__(self, features, phrase_grid, freq, max_score, layer_zooms, config=None):
        # phrase table not needed here; pass a minimal empty grid table
        self.index = IndexData(features, phrase_grid.slice(0, 0), freq, max_score,
                               layer_zooms, config=config, presorted=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """One input row = one query (STACK_SCHEMA). Mirrors the fused
        forward_one verify loop: precise feature-center proximity
        (min(center, furthest-tile-corner) bound like attach_proximity),
        context squishy, squishy score inheritance, ghost/place-name
        dedup, identical final sort."""
        import json as _json

        from ..geom.ops import nearest_point_on_multiline
        from ..util import proximity as prox
        from .engine import (
            GRANT_SCORE_LAYERS,
            INHERIT_SCORE_LAYERS,
            TMPID_SHIFT,
            _display_text,
            _squishy_boost,
            attach_cells,
            close_but_no_cigar_adj,
            get_matching_text,
        )

        d = batch.to_pydict()
        rows = {name: [] for name, _ in RESULT_FIELDS}
        for qi in range(batch.num_rows):
            qid = d["query_id"][qi]
            lim = int(d["limit"][qi])
            plon, plat = d["proximity_lon"][qi], d["proximity_lat"][qi]
            has_prox = plon is not None
            cov_flat = d["cover_tmpids"][qi]
            cov_counts = d["cover_counts"][qi]
            cov_off = np.concatenate([[0], np.cumsum(cov_counts)]).astype(int)
            best: dict[int, dict] = {}
            for si in range(len(d["tmpid"][qi])):
                tmpid = int(d["tmpid"][qi][si])
                frow = self.index.row_by_tmpid(tmpid)
                if frow is None:
                    continue
                feature = self.index.feature_at(frow)
                ctx = _context_for(self.index, frow, int(feature.idx))
                addr_number = d["address"][qi][si]
                resolved = resolve_address(feature, addr_number) if addr_number else None
                matched_address = resolved["address"] if resolved else None
                routable = None
                if resolved and resolved.get("line"):
                    routable = nearest_point_on_multiline(
                        resolved["lon"], resolved["lat"], [resolved["line"]])
                zoom_pm = int(d["zoom"][qi][si])
                gscore = float(d["gscore"][qi][si])
                if has_prox:
                    # fused attach_proximity: distance = min(center
                    # haversine, furthest corner of the cover tile)
                    center_d = float(prox.haversine_miles(
                        plon, plat, float(feature.center_lon), float(feature.center_lat)))
                    gx, gy = float(d["gx"][qi][si]), float(d["gy"][qi][si])
                    nz = 2.0 ** zoom_pm
                    max_corner = 0.0
                    for dx in (0.0, 1.0):
                        for dy in (0.0, 1.0):
                            lon_c = (gx + dx) / nz * 360.0 - 180.0
                            lat_c = float(np.degrees(np.arctan(
                                np.sinh(np.pi * (1 - 2 * (gy + dy) / nz)))))
                            max_corner = max(max_corner, float(
                                prox.haversine_miles(plon, plat, lon_c, lat_c)))
                    dist = min(center_d, max_corner)
                    scoredist = float(prox.scoredist(
                        gscore, self.index.min_score, self.index.max_score,
                        dist, zoom_pm))
                else:
                    dist = 0.0
                    scoredist = gscore

                display, matched_lang = _display_text(feature, None)
                overrides = {}
                ojson = getattr(feature, "overrides_json", "") or ""
                if ojson:
                    overrides = _json.loads(ojson)
                ctx_names = []
                for c in ctx:
                    if c.layer in overrides and str(c.text) != overrides[c.layer]:
                        ctx_names.append(overrides[c.layer])
                    else:
                        ctx_names.append(_display_text(c, None)[0])
                if self.index.config is not None and self.index.config.place_format:
                    place_name = self.index.config.render_place_name(
                        display, ctx_names, matched_address, language=matched_lang)
                else:
                    name_prefix = f"{matched_address} " if matched_address else ""
                    place_name = name_prefix + ", ".join([display] + ctx_names)
                matching_text, matching_language = get_matching_text(
                    self.index, feature, int(d["top_phash"][qi][si]), None,
                    d["top_subquery"][qi][si], matched_lang, display)

                ghost = float(feature.score) < 0
                relevance = float(d["relev"][qi][si])
                sl_ = slice(cov_off[si], cov_off[si + 1])
                relevance += close_but_no_cigar_adj(
                    cov_flat[sl_], d["cover_idxs"][qi][sl_],
                    d["cover_zooms"][qi][sl_], d["cover_sublens"][qi][sl_],
                    d["cover_masks"][qi][sl_], d["cover_relevs"][qi][sl_],
                    tmpid, ctx)
                covers_tmp = set(cov_flat[cov_off[si]:cov_off[si + 1]])
                squishy_ctx_target = None
                for c in ctx:
                    ctmp = int(c.idx) * TMPID_SHIFT + int(c.fid)
                    if ctmp in covers_tmp and c.layer in INHERIT_SCORE_LAYERS:
                        squishy_ctx_target = str(c.text).lower()
                        break
                if squishy_ctx_target is not None:
                    for c in ctx:
                        ctmp = int(c.idx) * TMPID_SHIFT + int(c.fid)
                        if ctmp not in covers_tmp and c.layer in GRANT_SCORE_LAYERS \
                                and str(c.text).lower() == squishy_ctx_target:
                            relevance += 0.01
                            break
                relevance = round_to(relevance, 6)

                feat_radius = float(getattr(feature, "proximity_radius", 0.0) or 0.0) or None
                if has_prox and feat_radius:
                    scoredist = float(prox.scoredist(
                        float(feature.score), self.index.min_score,
                        self.index.max_score, dist, int(feature.zoom),
                        radius=feat_radius))
                squishy = _squishy_boost(self.index, feature, ctx, covers_tmp)
                if squishy > 0:
                    boosted = min(float(feature.score) + squishy, self.index.max_score)
                    if has_prox:
                        scoredist = float(prox.scoredist(
                            boosted, self.index.min_score, self.index.max_score,
                            dist, int(feature.zoom), radius=feat_radius))
                    else:
                        scoredist = scoredist + squishy
                composite = prox.relevance_score(
                    relevance, scoredist if has_prox else 1.0,
                    address=matched_address if addr_number else "n/a", ghost=ghost)
                if resolved:
                    lon, lat = resolved["lon"], resolved["lat"]
                else:
                    lon, lat = float(feature.center_lon), float(feature.center_lat)
                cand = {
                    "feature_id": feature.doc_id, "relevance": relevance,
                    "composite": composite, "place_name": place_name,
                    "center_lon": lon, "center_lat": lat,
                    "zoom": int(feature.zoom),  # cells derived after the limit
                    "context": [c.doc_id for c in ctx],
                    "score": float(feature.score), "scoredist": float(scoredist),
                    "idx": int(feature.idx), "fid": int(feature.fid),
                    "address": matched_address,
                    "routable_lon": routable[0] if routable else None,
                    "routable_lat": routable[1] if routable else None,
                    "matching_text": matching_text,
                    "matching_language": matching_language,
                    "language": matched_lang,
                }
                prev = best.get(tmpid)
                if prev is None or (cand["relevance"], cand["composite"]) > (
                        prev["relevance"], prev["composite"]):
                    best[tmpid] = cand

            # D2 place-name dedup, then D3 ghost-vs-scored (fused order)
            results = []
            seen_names: set[str] = set()
            for cand in sorted(best.values(), key=lambda x: (
                    -x["relevance"], -x["composite"], -x["scoredist"], x["idx"], x["fid"])):
                if cand["place_name"] in seen_names:
                    continue
                seen_names.add(cand["place_name"])
                results.append(cand)
            scored_texts = {
                r["place_name"].split(",")[0].strip().lower()
                for r in results if r["score"] >= 0
            }
            results = [
                r for r in results
                if r["score"] >= 0
                or r["place_name"].split(",")[0].strip().lower() not in scored_texts
            ]
            results.sort(key=lambda x: (
                -x["relevance"], -x["composite"], -x["scoredist"], x["idx"], x["fid"]))
            for rank, res in enumerate(results[:lim]):
                rows["query_id"].append(qid)
                res["rank"] = rank
                attach_cells(res)  # cells only for surviving rows
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
    # ramp floor at half the cap: autoscaling from 1 actor wastes the
    # first seconds of every run at low parallelism (hurts short bench
    # legs); fractional num_cpus keeps scheduler slots free regardless
    conc = ((max(1, concurrency // 2), concurrency)
            if isinstance(concurrency, int) else concurrency)
    if phrase_shards <= 1:
        pm_rows = queries_ds.map_batches(
            PhrasematchStage, fn_constructor_kwargs=kwargs,
            batch_format="pyarrow", batch_size=256, concurrency=conc,
            num_cpus=0.5,
        )
    else:
        # size each shard's pool so the pools together fit the CPU
        # budget — phrase_shards full-size pools oversubscribe and
        # thrash (measured 7× parallelism on 32 CPUs before this)
        per = max(1, (concurrency + phrase_shards - 1) // phrase_shards)
        conc = (max(1, per // 2), per)
        # phrase-sharded fan-out: every query visits every shard's actor
        # pool; each pool holds only its prefix-bin slice of the phrase
        # table (phrase rows are disjoint across shards, so the union has
        # no duplicate phrasematch rows). The groupby(query_id) shuffle
        # below reassembles per-query state — no actor holds the whole
        # phrase table.
        parts = []
        for s in range(phrase_shards):
            kw = dict(kwargs, shard=s, of_n=phrase_shards)
            parts.append(queries_ds.map_batches(
                PhrasematchStage, fn_constructor_kwargs=kw,
                batch_format="pyarrow", batch_size=256, concurrency=conc,
                num_cpus=0.5,
            ))
        pm_rows = parts[0].union(*parts[1:])

    def add_qshard(df):
        import pandas as pd

        df = df.copy()
        # 256 shards: the coalesce+verify stage is the expensive one
        # (~9 ms/query); finer groups give the actor pool enough tasks
        # to ramp to full width and balance skewed queries
        df["__qshard"] = (
            pd.util.hash_pandas_object(df["query_id"], index=False).to_numpy() % 256
        ).astype("int32")
        return df

    stacks = (
        pm_rows.map_batches(add_qshard, batch_format="pandas")
        .groupby("__qshard")
        .map_groups(coalesce_shard, batch_format="pandas")
    )
    return stacks.map_batches(
        VerifyStage, fn_constructor_kwargs=kwargs,
        batch_format="pyarrow", batch_size=512,
        concurrency=((max(1, concurrency // 2), concurrency)
                     if isinstance(concurrency, int) else concurrency),
        num_cpus=0.5,
    )
