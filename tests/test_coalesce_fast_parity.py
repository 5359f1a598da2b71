"""Pin coalesce_fast (the shard-level array kernel) against the object
kernel (coalesce.stack_and_coalesce + the round-4 per-query glue,
preserved verbatim below as the oracle) on randomized inputs.

The staged pipeline's coalesce stage used to build Grid / Phrasematch /
Stack objects per query; the array kernel replaces it and must be
bit-identical — same candidate rows, same ordering, same floats
(the bench additionally pins a sha256 over the full candidate stream,
PERF_NOTES #30)."""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa
import pytest

from carmen_ray import constants
from carmen_ray.geocode.coalesce import (
    ChunkedVerifyPlanner,
    Grid,
    Phrasematch,
    non_overlap_from_bits,
    stack_and_coalesce,
)
from carmen_ray.geocode.coalesce_fast import coalesce_shard_table
from carmen_ray.geocode.staged import (
    CAND_SCHEMA,
    PM_SCHEMA,
    VSHARD_SALT,
    grid_prox_arrays,
)
from carmen_ray.util import grid as gridmod


def _reference_coalesce_group(col: dict, rows) -> None:
    """The round-4 object-kernel glue, verbatim (pre-rewrite
    staged.coalesce_group) — the oracle for the array kernel."""
    import pandas as pd

    from carmen_ray.geocode.engine import _direction_effects

    n_rows = len(col["query_id"])
    if n_rows == 0:
        return
    qid = col["query_id"][0]
    qlen = int(col["query_len"][0])
    plon = col["proximity_lon"][0]
    plat = col["proximity_lat"][0]
    lim = int(col["limit"][0])
    has_prox = plon is not None and not pd.isna(plon)

    zooms_col = col["zoom"]
    decoded = []
    for i in range(n_rows):
        dec = gridmod.decode(np.asarray(col["grids"][i], dtype=np.uint64))
        # score3 bit0 = the cross-language mismatch flag (staged packed
        # collector); re-apply the penalty like coalesce_fast does
        dec["relev"] = dec["relev"] * np.where(
            (dec["score"].astype(np.int64) & 1).astype(bool),
            constants.LANGUAGE_PENALTY, 1.0)
        decoded.append((i, dec,
                        np.asarray(col["grid_scores"][i], dtype=np.float64)))

    if has_prox and decoded:
        all_x = np.concatenate([d["x"].astype(np.float64) for _, d, _ in decoded])
        all_y = np.concatenate([d["y"].astype(np.float64) for _, d, _ in decoded])
        all_n = np.concatenate([
            np.full(len(d["x"]), 2.0 ** int(zooms_col[i])) for i, d, _ in decoded])
        all_scores = np.concatenate([s for _, _, s in decoded])
        all_zoom = np.concatenate([
            np.full(len(d["x"]), int(zooms_col[i]), dtype=np.int64)
            for i, d, _ in decoded])
        max_score = float(col["max_score"][0])
        all_crad = np.concatenate([
            np.full(len(d["x"]), float(col["coalesce_radius"][i]))
            for i, d, _ in decoded])
        all_dist, all_sd = grid_prox_arrays(
            all_x, all_y, all_n, all_zoom, all_scores, all_crad,
            plon, plat, max_score)
    else:
        all_dist = all_sd = None

    idx_l = col["idx"].tolist()
    layer_l = col["layer"].tolist()
    zoom_l = zooms_col.tolist()
    mask_l = col["mask"].tolist()
    weight_l = col["weight"].tolist()
    subq_l = col["subquery"].tolist()
    prefix_l = col["prefix"].tolist()
    addr_l = col["address"].tolist()
    crad_l = col["coalesce_radius"].tolist()
    has_partial_col = "partial_number" in col
    partial_l = col["partial_number"].tolist() if has_partial_col else None
    phashes_col = col["phashes"]

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
        idx_base = idx_l[i] * (1 << 25)
        addr_v = addr_l[i]
        partial = bool(partial_l[i]) if has_partial_col else False
        grids = [
            Grid(x=x, y=y, relev=rv, score=sc, fid=fd, tmpid=idx_base + fd,
                 distance=dv, scoredist=sv, phash=ph)
            for x, y, rv, sc, fd, dv, sv, ph in zip(
                dec["x"].tolist(), dec["y"].tolist(), dec["relev"].tolist(),
                scores.tolist(), dec["id"].tolist(), dists.tolist(),
                np.asarray(sds).tolist(), phashes_col[i].tolist())
        ]
        if partial and has_prox:
            r = float(crad_l[i]) or float(constants.COALESCE_PROXIMITY_RADIUS)
            grids = [g for g in grids if g.distance <= r]
            if not grids:
                continue
        pms.append(Phrasematch(
            idx=idx_l[i], layer=layer_l[i],
            zoom=zoom_l[i], mask=mask_l[i],
            weight=weight_l[i], subquery=subq_l[i],
            phrase_id=0, prefix=prefix_l[i], grids=grids,
            address=addr_v if isinstance(addr_v, str) else None,
            partial_number=partial,
        ))

    io_mask = col["ignore_order"].astype(bool)
    ignore_layers = frozenset(str(l) for l in col["layer"][io_mask])
    idx_rank = {int(i): int(n) for i, n in zip(col["idx"], col["ndx"])}
    non_overlap = None
    if "stack_bits" in col and col["stack_bits"].any():
        non_overlap = non_overlap_from_bits(
            {int(i): int(b) for i, b in zip(col["idx"], col["stack_bits"])})
    pre_cut = stack_and_coalesce(pms, qlen, idx_rank=idx_rank,
                                 non_overlap=non_overlap)
    stacks = pre_cut[: constants.VERIFYMATCH_MAX_FEATURES_LIMIT]
    if not stacks:
        return
    # query-wide distinct (tmpid, layer) pairs over the PRE-cut list
    # (the strict-map payload; CAND_SCHEMA qmatch_* comment)
    qm_t, qm_l, qm_m, seen_pairs = [], [], [], set()
    for st_ in pre_cut:
        for e in st_.entries:
            key = (e.grid.tmpid, e.pm.layer, e.pm.mask)
            if key not in seen_pairs:
                seen_pairs.add(key)
                qm_t.append(key[0])
                qm_l.append(key[1])
                qm_m.append(key[2])
    covers_list = [st.covers() for st in stacks]
    partial_flags = [
        any(getattr(e.pm, "partial_number", False) for e in cv)
        for cv in covers_list]
    if not any(partial_flags):
        keep = set(ChunkedVerifyPlanner(
            [st.penalized for st in stacks], partial_flags,
        ).replay([True] * len(stacks)))
        stacks = [st for i, st in enumerate(stacks) if i in keep]
        covers_list = [cv for i, cv in enumerate(covers_list) if i in keep]
    for si, (st, covers) in enumerate(zip(stacks, covers_list)):
        tmpid = covers[0].grid.tmpid
        rows["query_id"].append(qid)
        rows["limit"].append(lim)
        rows["proximity_lon"].append(plon if has_prox else None)
        rows["proximity_lat"].append(plat if has_prox else None)
        rows["si"].append(si)
        rows["relev"].append(_direction_effects(covers, st.relev, ignore_layers))
        rows["st_relev"].append(st.penalized)
        rows["tmpid"].append(tmpid)
        rows["zoom"].append(covers[0].pm.zoom)
        rows["gx"].append(covers[0].grid.x)
        rows["gy"].append(covers[0].grid.y)
        rows["gscore"].append(covers[0].grid.score)
        rows["address"].append(next(
            (e.pm.address for e in covers if e.pm.address), None))
        rows["top_subquery"].append(covers[0].pm.subquery)
        rows["cover_text"].append(" ".join(e.pm.subquery for e in covers))
        rows["top_phash"].append(covers[0].grid.phash)
        rows["cover_tmpids"].append([e.grid.tmpid for e in covers])
        rows["qmatch_tmpids"].append(qm_t)
        rows["qmatch_layers"].append(qm_l)
        rows["qmatch_masks"].append(qm_m)
        rows["cover_idxs"].append([e.pm.idx for e in covers])
        rows["cover_zooms"].append([e.pm.zoom for e in covers])
        rows["cover_sublens"].append([len(e.pm.subquery) for e in covers])
        rows["cover_masks"].append([e.pm.mask for e in covers])
        rows["cover_relevs"].append([e.relev for e in covers])
        rows["partial_number"].append(
            any(getattr(e.pm, "partial_number", False) for e in covers))
        vshard = int(tmpid % constants.FSHARD_MOD)
        rows["vshard"].append(vshard)
        rows["vskey"].append(vshard * VSHARD_SALT + si % VSHARD_SALT)


def _reference_shard(tbl: pa.Table) -> pa.Table:
    rows = {n: [] for n in CAND_SCHEMA.names}
    cols = {c: tbl.column(c).to_numpy(zero_copy_only=False)
            for c in tbl.column_names}
    qids = cols["query_id"]
    order = np.argsort(qids, kind="mergesort")
    sorted_qids = qids[order]
    bounds = np.flatnonzero(np.concatenate(
        [[True], sorted_qids[1:] != sorted_qids[:-1]]))
    bounds = np.append(bounds, len(sorted_qids))
    for b in range(len(bounds) - 1):
        sel = order[bounds[b]:bounds[b + 1]]
        _reference_coalesce_group({c: v[sel] for c, v in cols.items()}, rows)
    return pa.table({n: pa.array(rows[n], type=CAND_SCHEMA.field(n).type)
                     for n in CAND_SCHEMA.names})


LAYERS = [("country", 0, 6), ("region", 1, 10), ("place", 2, 12),
          ("street", 3, 14), ("poi", 4, 14)]


def _random_pm_table(rng: random.Random, n_queries: int) -> pa.Table:
    rows = {n: [] for n in PM_SCHEMA.names}
    for q in range(n_queries):
        qid = f"q{q}"
        qlen = rng.randint(1, 4)
        has_prox = rng.random() < 0.5
        plon = rng.uniform(-179, 179) if has_prox else None
        plat = rng.uniform(-60, 60) if has_prox else None
        n_pms = rng.randint(1, 6)
        # anchor tiles so stacks actually align across zooms
        ax = rng.randint(0, 2 ** 6 - 1)
        ay = rng.randint(0, 2 ** 6 - 1)
        for _ in range(n_pms):
            layer, idx, zoom = rng.choice(LAYERS)
            n_grids = rng.choice([1, 2, 5, 70, 120][: rng.randint(1, 5)])
            shift = zoom - 6
            xs, ys, relevs, scores, fids = [], [], [], [], []
            for _g in range(n_grids):
                if rng.random() < 0.7:
                    x = (ax << shift) + rng.randint(0, (1 << shift) - 1) \
                        if shift else ax
                    y = (ay << shift) + rng.randint(0, (1 << shift) - 1) \
                        if shift else ay
                else:
                    x = rng.randint(0, 2 ** zoom - 1)
                    y = rng.randint(0, 2 ** zoom - 1)
                xs.append(x)
                ys.append(y)
                relevs.append(rng.choice([0.4, 0.6, 0.8, 1.0]))
                scores.append(rng.randint(0, 7))
                fids.append(rng.randint(0, 4000))
            packed = gridmod.encode(xs, ys, relevs, scores, fids)
            mask_start = rng.randint(0, qlen - 1)
            mask_len = rng.randint(1, qlen - mask_start)
            mask = ((1 << mask_len) - 1) << mask_start
            rows["query_id"].append(qid)
            rows["query_len"].append(qlen)
            rows["proximity_lon"].append(plon)
            rows["proximity_lat"].append(plat)
            rows["limit"].append(5)
            rows["idx"].append(idx)
            rows["layer"].append(layer)
            rows["zoom"].append(zoom)
            rows["mask"].append(mask)
            rows["weight"].append(round(rng.uniform(0.2, 1.0), 2))
            rows["prefix"].append(rng.random() < 0.3)
            rows["address"].append(
                str(rng.randint(1, 999)) if rng.random() < 0.2 else None)
            rows["grids"].append(packed.tolist())
            rows["grid_scores"].append(
                [float(s) * 7.5 for s in scores])
            rows["phashes"].append(
                [rng.randint(0, 2 ** 40) for _ in range(n_grids)])
            rows["max_score"].append(52.5)
            rows["subquery"].append(rng.choice(["alpha", "beta", "gamma rd"]))
            rows["ignore_order"].append(rng.random() < 0.1)
            rows["ndx"].append(idx)
            rows["stack_bits"].append(
                rng.choice([0, 1, 2, 3]) if rng.random() < 0.2 else 0)
            rows["partial_number"].append(rng.random() < 0.15)
            rows["coalesce_radius"].append(rng.choice([0.0, 0.0, 40.0]))
    return pa.table({n: pa.array(rows[n], type=PM_SCHEMA.field(n).type)
                     for n in PM_SCHEMA.names})


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_array_kernel_matches_object_kernel(seed):
    rng = random.Random(seed)
    tbl = _random_pm_table(rng, n_queries=40)
    want = _reference_shard(tbl)
    got = coalesce_shard_table(tbl)
    assert got.schema.equals(want.schema)
    assert got.num_rows == want.num_rows
    wd = want.to_pydict()
    gd = got.to_pydict()
    for name in CAND_SCHEMA.names:
        assert gd[name] == wd[name], f"column {name} diverged (seed {seed})"


def test_empty_shard():
    tbl = pa.table({n: pa.array([], type=PM_SCHEMA.field(n).type)
                    for n in PM_SCHEMA.names})
    out = coalesce_shard_table(tbl)
    assert out.num_rows == 0
    assert out.schema.equals(CAND_SCHEMA)


def test_sliced_batch_parity():
    """The kernel reads Arrow list buffers directly — a sliced batch
    (non-zero offset, shared buffers) must produce the same rows as the
    equivalent compacted batch."""
    rng = random.Random(99)
    tbl = _random_pm_table(rng, n_queries=30)
    sl = tbl.slice(37, 290)
    compact = pa.table(sl.to_pydict(), schema=PM_SCHEMA)
    a = coalesce_shard_table(sl).to_pydict()
    b = coalesce_shard_table(compact).to_pydict()
    assert a == b
