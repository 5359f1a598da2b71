"""Array-based stack-and-coalesce kernel for the staged path.

Bit-identical rewrite of coalesce.stack_and_coalesce + the staged
per-query glue (semantics: /root/reference/docs/how-carmen-works.md:151-199,
lib/geocoder/spatialmatch.js:21-136) that processes a whole exchange
shard at a time and never builds Grid / Stack / StackEntry objects:

- decode + proximity + the per-pm grid prune run ONCE over the shard's
  flat Arrow list-column buffers (one `grid.decode`, one
  `grid_prox_arrays` gather/scatter over just the proximity queries'
  grids, one global lexsort for the oversize-pm top-64 cut);
- the per-query DFS enumeration keeps the reference order exactly
  (including the _MAX_PARTIALS truncation points), but partials are
  plain tuples of (row, flat-grid, relev) triples and the
  per-(partial, pm) containment scan is a lazily-built tile-hash
  lookup: a pm buckets its grids by their cell coarsened to zoom z the
  first time some stack with finest zoom z probes it, so extending a
  stack is ONE dict probe instead of a scan over every grid (aligned
  tiles nest — see coalesce.py), and queries that never stack past
  depth 1 build no maps at all;
- rebalance (spatialmatch.js:98-136), the hierarchy-gap penalty, the
  final _stack_sort_key ordering AND the direction-dedup keys run
  vectorized over flat entry arrays for ALL queries in the shard at
  once (reduceat per partial, one lexsort with the query ordinal as
  the outermost key; popcount via a 16-bit LUT); every float
  expression keeps the reference's operation order so results are
  IEEE-bit-equal to the scalar kernel;
- the output CAND table is built Arrow-native: the per-cover list
  columns come straight from flat numpy gathers + offsets
  (ListArray.from_arrays), never from per-stack Python lists.

The fused path (engine.ForwardGeocoder) keeps the object kernel in
coalesce.py; tests/test_coalesce_fast_parity.py pins this kernel
against it on randomized inputs, and the staged↔fused bench invariant
(identical result tables) holds as before.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import constants
from ..util import grid as gridmod

_MAX_PARTIALS = constants.STACKABLE_LIMIT * 8
from .coalesce import _MAX_VISITS  # noqa: E402 — shared DFS visit budget

# 16-bit popcount LUT: query masks are < 2^query_len (≤ 2^20), so two
# lookups cover them; int64-safe via four.
_POP16 = np.array([bin(i).count("1") for i in range(1 << 16)], dtype=np.int64)


def _popcount(a: np.ndarray) -> np.ndarray:
    a = a.astype(np.int64, copy=False)
    return (_POP16[a & 0xFFFF] + _POP16[(a >> 16) & 0xFFFF]
            + _POP16[(a >> 32) & 0xFFFF] + _POP16[(a >> 48) & 0xFFFF])


def direction_effects_lists(layers, masks, texts, relevs, relevance,
                            ignore_layers) -> float:
    """engine._direction_effects over parallel cover lists (backy ×0.5 +
    direction bonus, verifymatch.js:847-933) — identical walk, no
    objects."""
    n = len(masks)
    if n < 2:
        return relevance
    direction = None
    lastmask = -1
    lasttext = None
    lastlayer = None
    adj = 0.0
    for k in range(n):
        backy = False
        ignore = layers[k] in ignore_layers or (
            lastlayer is not None and lastlayer in ignore_layers)
        if k > 0:
            if direction is None and not ignore:
                direction = "ascending" if lastmask < masks[k] else "descending"
            if texts[k] != lasttext:
                if direction == "ascending":
                    backy = lastmask > masks[k]
                else:
                    backy = lastmask < masks[k]
        if backy and not ignore:
            adj -= 0.5 * relevs[k]
        lastmask = masks[k]
        lasttext = texts[k]
        lastlayer = layers[k]
    relevance = relevance + adj
    if direction:
        relevance -= 0.01
        if direction == "ascending":
            relevance += 0.01
    return max(relevance, 0.0)


def _flat_list_column(col) -> tuple[np.ndarray, np.ndarray]:
    """(flat values, zero-based offsets) of an Arrow list column.

    Offsets are rebased to 0 so every list column of the batch shares
    one flat index space regardless of per-column slice/chunk layout
    (row lengths are identical across the PM table's list columns by
    construction)."""
    la = col.combine_chunks()
    if isinstance(la, pa.ChunkedArray):
        la = la.chunk(0)
    offs = la.offsets.to_numpy().astype(np.int64)
    vals = la.values.to_numpy(zero_copy_only=False)[offs[0]:offs[-1]]
    return vals, offs - offs[0]


def _enumerate_query(pm_rows, qidx, qmask, qzoom, IDX_l, X_l, Y_l, GRW_l,
                     glists, non_overlap, TMP_a, SD_a, MASK_l):
    """DFS stack enumeration for one query — exact reference order
    (coalesce.stack_and_coalesce's try_extend) including the keyed
    (mask, tmpid-chain) partial reduction and the _MAX_PARTIALS /
    _MAX_VISITS budgets. `pm_rows` are shard row ids sorted by
    (idx, mask); `qidx/qmask/qzoom/glists` are the matching per-pm
    locals; entries are (row, flat grid id, entry relev)."""
    n_pms = len(pm_rows)
    # lazy per-pm tile maps: maps[i][z] buckets pm i's grids by cell
    # coarsened to zoom z, built on first probe. Probe with the base's
    # finest tile (fzx, fzy, fzz):
    #   pz >= fzz -> maps[i][fzz][(fzx, fzy)]
    #   pz <  fzz -> maps[i][pz][(fzx >> d, fzy >> d)]
    tile_maps: list[dict] = [{} for _ in range(n_pms)]

    def probe(i: int, z: int, tx: int, ty: int):
        """Grids of pm i aligned with tile (tx, ty) at zoom z, in grid
        order. First probe of an (i, z) pair is a linear scan; the
        bucketed map is built on the second probe (most pairs are
        probed once — building a dict for them costs more than one
        scan)."""
        per = tile_maps[i]
        m = per.get(z)
        if type(m) is dict:
            return m.get((tx, ty))
        d = qzoom[i] - z
        if m is None:
            per[z] = 1
            return [g for g in glists[i]
                    if (X_l[g] >> d) == tx and (Y_l[g] >> d) == ty] or None
        m = {}
        for g in glists[i]:
            key = (X_l[g] >> d, Y_l[g] >> d)
            b = m.get(key)
            if b is None:
                m[key] = [g]
            else:
                b.append(g)
        per[z] = m
        return m.get((tx, ty))

    # keyed best-cell-variant partials, mirroring the object kernel's
    # _keep exactly (chains build idx-ascending so the last entry is
    # the finest cover)
    partials: dict = {}
    visits = [0]

    def append(p):
        ne, nmask, nrel = p
        # per-entry masks in the key (see the object kernel's _keep)
        key = (nmask, tuple((int(MASK_l[e[0]]), int(TMP_a[e[1]]))
                            for e in ne))
        prev = partials.get(key)
        if prev is None:
            partials[key] = p
        elif (nrel, SD_a[ne[-1][1]]) > (prev[2], SD_a[prev[0][-1][1]]):
            partials[key] = p
        visits[0] += 1

    # extension candidates per pm position: j > i with idx_j > idx_i and
    # a mask disjoint from pm i's — exactly the pms the object kernel's
    # scan would not `continue` past on idx / own-mask grounds. Entries
    # whose candidate list is empty skip the recursive call entirely
    # (the call would only scan and return).
    ext: list = []
    for i in range(n_pms):
        mi = qmask[i]
        xi = qidx[i]
        ext.append([j for j in range(i + 1, n_pms)
                    if not (qmask[j] & mi) and qidx[j] > xi])

    def extend(base_entries, base_mask, base_relev, fzx, fzy, fzz, cand_pms,
               qidx=qidx, qmask=qmask, qzoom=qzoom, pm_rows=pm_rows,
               X_l=X_l, Y_l=Y_l, GRW_l=GRW_l, ext=ext, probe=probe,
               append=append, MAXP=_MAX_PARTIALS):
        for i in cand_pms:
            if len(partials) >= MAXP or visits[0] >= _MAX_VISITS:
                return
            pmask = qmask[i]
            if base_mask & pmask:
                continue
            if non_overlap:
                no = non_overlap.get(qidx[i])
                if no and any(IDX_l[e[0]] in no for e in base_entries):
                    continue
            pz = qzoom[i]
            if pz >= fzz:
                cand = probe(i, fzz, fzx, fzy)
                if not cand:
                    continue
                nmask = base_mask | pmask
                r = pm_rows[i]
                ei = ext[i]
                for g in cand:
                    gr = GRW_l[g]
                    ne = base_entries + ((r, g, gr),)
                    nrel = base_relev + gr
                    append((ne, nmask, nrel))
                    if len(partials) >= MAXP or visits[0] >= _MAX_VISITS:
                        return
                    if ei:
                        extend(ne, nmask, nrel, X_l[g], Y_l[g], pz, ei)
            else:
                d = fzz - pz
                cand = probe(i, pz, fzx >> d, fzy >> d)
                if not cand:
                    continue
                nmask = base_mask | pmask
                r = pm_rows[i]
                ei = ext[i]
                for g in cand:
                    gr = GRW_l[g]
                    ne = base_entries + ((r, g, gr),)
                    nrel = base_relev + gr
                    append((ne, nmask, nrel))
                    if len(partials) >= MAXP or visits[0] >= _MAX_VISITS:
                        return
                    if ei:
                        extend(ne, nmask, nrel, fzx, fzy, fzz, ei)

    for i in range(n_pms):
        if len(partials) >= _MAX_PARTIALS or visits[0] >= _MAX_VISITS:
            break
        pmask = qmask[i]
        pz = qzoom[i]
        r = pm_rows[i]
        ei = ext[i]
        for g in glists[i]:
            gr = GRW_l[g]
            ne = ((r, g, gr),)
            append((ne, pmask, gr))
            if len(partials) >= _MAX_PARTIALS or visits[0] >= _MAX_VISITS:
                return list(partials.values())
            if ei:
                extend(ne, pmask, gr, X_l[g], Y_l[g], pz, ei)
    return list(partials.values())


def coalesce_shard_table(shard_group: pa.Table) -> pa.Table:
    """Coalesce every query in one exchange shard → CAND-schema table.

    Vector stages (decode, proximity, prune, rebalance, gap penalty,
    final ordering, dedup keys, output assembly) run once over the
    whole shard; only the stack enumeration and the direction-dedup
    walk are per-query Python."""
    import pandas as pd

    from .coalesce import (
        MAX_GRIDS_PER_PM,
        ChunkedVerifyPlanner,
        non_overlap_from_bits,
    )
    from .staged import CAND_SCHEMA, VSHARD_SALT, grid_prox_arrays

    n_rows = shard_group.num_rows
    empty = pa.table({n: pa.array([], type=CAND_SCHEMA.field(n).type)
                      for n in CAND_SCHEMA.names})
    if n_rows == 0:
        return empty

    cols = {c: shard_group.column(c).to_numpy(zero_copy_only=False)
            for c in shard_group.column_names
            if c not in ("grids", "grid_scores", "phashes")}
    gvals_u, goffs = _flat_list_column(shard_group.column("grids"))
    svals, _ = _flat_list_column(shard_group.column("grid_scores"))
    pvals, _ = _flat_list_column(shard_group.column("phashes"))
    gvals = np.asarray(gvals_u, dtype=np.uint64)
    svals = np.asarray(svals, dtype=np.float64)
    n_grids = len(gvals)
    row_len = np.diff(goffs)

    dec = gridmod.decode(gvals)
    # cross-language grid penalty: the packed score3 field is free at
    # this boundary (real scores ride the grid_scores column), so its
    # low bit carries the lang-mismatch flag set by the packed
    # phrasematch collector (staged.py; constants.LANGUAGE_PENALTY)
    mism = (dec["score"].astype(np.int64) & 1).astype(bool)
    if mism.any():
        dec["relev"] = dec["relev"] * np.where(
            mism, constants.LANGUAGE_PENALTY, 1.0)
    idx_col = cols["idx"].astype(np.int64)
    zoom_col = cols["zoom"].astype(np.int64)
    weight_col = cols["weight"].astype(np.float64)
    crad_col = cols["coalesce_radius"].astype(np.float64)
    mask_col = cols["mask"].astype(np.int64)
    ndx_col = cols["ndx"].astype(np.int64)
    qlen_col = cols["query_len"].astype(np.int64)
    plon_col = cols["proximity_lon"]
    plat_col = cols["proximity_lat"]
    partial_col = (cols["partial_number"].astype(bool)
                   if "partial_number" in cols
                   else np.zeros(n_rows, dtype=bool))

    G_fid = dec["id"].astype(np.int64)
    G_tmpid = G_fid + np.repeat(idx_col * (1 << 25), row_len)
    # entry relev = grid relev × subquery weight (what carmen-core emits)
    G_grw = dec["relev"] * np.repeat(weight_col, row_len)

    # ---- proximity: one gather/scatter pass over prox queries' grids --
    prox_row = ~pd.isna(plon_col)
    all_dist = np.zeros(n_grids)
    all_sd = svals.copy()
    if prox_row.any():
        pr_len = row_len[prox_row]
        gsel = np.flatnonzero(np.repeat(prox_row, row_len))
        max_score = float(cols["max_score"][0])  # constant per index
        row_n = np.array([2.0 ** int(z) for z in zoom_col[prox_row]])
        d_g, sd_g = grid_prox_arrays(
            dec["x"][gsel].astype(np.float64),
            dec["y"][gsel].astype(np.float64),
            np.repeat(row_n, pr_len),
            np.repeat(zoom_col[prox_row], pr_len),
            svals[gsel],
            np.repeat(crad_col[prox_row], pr_len),
            np.repeat(plon_col[prox_row].astype(np.float64), pr_len),
            np.repeat(plat_col[prox_row].astype(np.float64), pr_len),
            max_score)
        all_dist[gsel] = d_g
        all_sd[gsel] = sd_g

    # ---- per-pm grid prune, vectorized over the shard ------------------
    # (a) partial-number nearby-only filter (carmen-core coalesce):
    #     grids of partial-number pms in a proximity query count only
    #     within the coalesce radius of the prox point
    kmask = np.ones(n_grids, dtype=bool)
    pp_row = partial_col & prox_row
    if pp_row.any():
        r_row = np.where(crad_col != 0.0, crad_col,
                         float(constants.COALESCE_PROXIMITY_RADIUS))
        kmask &= ~(np.repeat(pp_row, row_len)
                   & (all_dist > np.repeat(r_row, row_len)))
    # (b) top-MAX_GRIDS_PER_PM cut for oversize pms: hot phrases hold
    #     hundreds-to-thousands of grids and stacking keeps at most 64 —
    #     building (then sorting, then discarding) Python state for the
    #     rest dominated the whole stage (~87% of grids on the bench
    #     corpus live in oversize pms). One global stable lexsort with
    #     the row as outer key reproduces every per-pm
    #     (-relev, -scoredist, tmpid) sort bit-identically; ≤cap pms
    #     keep input order, exactly like the object kernel's
    #     sorted()-only-when-oversize.
    kcum = np.concatenate(([0], np.cumsum(kmask)))
    kept_cnt = kcum[goffs[1:]] - kcum[goffs[:-1]]
    oversize = kept_cnt > MAX_GRIDS_PER_PM
    row_glists: dict = {}
    if oversize.any():
        osel = np.flatnonzero(kmask & np.repeat(oversize, row_len))
        row_of = np.repeat(np.arange(n_rows), row_len)[osel]
        order = np.lexsort((G_tmpid[osel], -all_sd[osel],
                            -dec["relev"][osel], row_of))
        sorted_gidx = osel[order]
        sorted_row = row_of[order]
        seg_starts = np.concatenate(
            ([0], np.flatnonzero(sorted_row[1:] != sorted_row[:-1]) + 1))
        seg_lens = np.diff(np.concatenate((seg_starts, [len(sorted_row)])))
        # cap DISTINCT FEATURES per pm, not raw cells (mirror of the
        # object kernel's kept-tmpid cut): a grid survives when its
        # tmpid is among the row's first MAX_GRIDS_PER_PM distinct
        # tmpids in quality order — every cell of a kept polygon stays.
        t = G_tmpid[sorted_gidx]
        pos = np.arange(len(t))
        pair_order = np.lexsort((pos, t, sorted_row))
        pt, pr = t[pair_order], sorted_row[pair_order]
        newpair = np.concatenate(
            ([True], (pt[1:] != pt[:-1]) | (pr[1:] != pr[:-1]))) \
            if len(pt) else np.zeros(0, dtype=bool)
        grp_id = np.cumsum(newpair) - 1
        first_pos_of_grp = pos[pair_order][newpair]
        elem_first_pos = np.empty(len(t), dtype=np.int64)
        elem_first_pos[pair_order] = first_pos_of_grp[grp_id]
        is_new = elem_first_pos == pos
        new_cum = np.cumsum(is_new)
        seg_base = new_cum[seg_starts] - is_new[seg_starts]
        drank_at_pos = new_cum - 1 - np.repeat(seg_base, seg_lens)
        top = drank_at_pos[elem_first_pos] < MAX_GRIDS_PER_PM
        top_gidx = sorted_gidx[top]
        top_row = sorted_row[top]
        cut = np.flatnonzero(top_row[1:] != top_row[:-1]) + 1
        for r, chunk in zip(top_row[np.concatenate(([0], cut))].tolist(),
                            np.split(top_gidx, cut)):
            row_glists[r] = chunk.tolist()
    # partial-filtered (but not oversize) rows keep ascending order
    pruned_small = pp_row & ~oversize & (kept_cnt < row_len)
    for r in np.flatnonzero(pruned_small).tolist():
        lo, hi = int(goffs[r]), int(goffs[r + 1])
        row_glists[r] = (np.arange(lo, hi)[kmask[lo:hi]]).tolist()

    # ---- compact to kept grids ------------------------------------------
    # everything past the prune touches only kept grids (~13% of the
    # bench corpus survives the top-64 cut); gathering them once keeps
    # the DFS's python-scalar lists (and every later per-grid gather)
    # small. The full-width master lists were ~100 MB of boxed ints per
    # task — fine serially, but 32 concurrent actor processes paging
    # that in at once measured up to 3.7x slower on identical shards.
    # In compact space every pm's grid list is the contiguous range
    # koffs[r]:koffs[r+1], in the exact order the object kernel would
    # iterate (input order, or the top-64 sorted order for oversize pms).
    if row_glists:
        IDENT = np.arange(n_grids, dtype=np.int64)
        klens = row_len.astype(np.int64).copy()
        pieces = []
        prev = 0
        for r in sorted(row_glists):
            lo, hi = int(goffs[r]), int(goffs[r + 1])
            if prev < lo:
                pieces.append(IDENT[prev:lo])
            kl = np.asarray(row_glists[r], dtype=np.int64)
            pieces.append(kl)
            klens[r] = len(kl)
            prev = hi
        if prev < n_grids:
            pieces.append(IDENT[prev:])
        kept = np.concatenate(pieces)
        X_a = dec["x"][kept]
        Y_a = dec["y"][kept]
        GRW_a = G_grw[kept]
        SD_a = all_sd[kept]
        TMP_a = G_tmpid[kept]
        FID_a = G_fid[kept]
        SC_a = svals[kept]
        PH_a = pvals[kept]
    else:
        klens = row_len
        X_a = dec["x"]
        Y_a = dec["y"]
        GRW_a = G_grw
        SD_a = all_sd
        TMP_a = G_tmpid
        FID_a = G_fid
        SC_a = svals
        PH_a = pvals
    koffs = np.concatenate(([0], np.cumsum(klens)))

    # python-scalar views for the DFS hot loop (kept grids only)
    X_l = X_a.tolist()
    Y_l = Y_a.tolist()
    GRW_l = GRW_a.tolist()
    IDX_l = idx_col.tolist()
    MASK_l = mask_col.tolist()
    ZOOM_l = zoom_col.tolist()
    koffs_l = koffs.tolist()

    # ---- group rows per query ------------------------------------------
    qids = cols["query_id"]
    order_q = np.argsort(qids, kind="mergesort")
    sorted_qids = qids[order_q]
    qbreaks = np.flatnonzero(np.concatenate(
        [[True], sorted_qids[1:] != sorted_qids[:-1]]))
    qbounds = np.append(qbreaks, len(sorted_qids))
    n_q = len(qbreaks)
    # one global (query, idx, mask) sort gives every query's pm order —
    # what the object kernel's sorted(phrasematches) produced, with the
    # same stability (row order within a query = input order)
    qcode = np.empty(n_rows, dtype=np.int64)
    qseg_rows = np.diff(qbounds)
    qcode[order_q] = np.repeat(np.arange(n_q, dtype=np.int64), qseg_rows)
    order_pm = np.lexsort((mask_col, idx_col, qcode))
    pm_bounds = np.concatenate(([0], np.cumsum(qseg_rows)))
    # per-query need for non_overlap / ignore_layers, precomputed
    sb_nz = (cols["stack_bits"].astype(np.int64) != 0)
    io_col = cols["ignore_order"].astype(bool)
    sb_cnt = np.concatenate(([0], np.cumsum(sb_nz[order_q])))
    io_cnt = np.concatenate(([0], np.cumsum(io_col[order_q])))
    q_has_sb = (sb_cnt[qbounds[1:]] - sb_cnt[qbounds[:-1]]) > 0
    q_has_io = (io_cnt[qbounds[1:]] - io_cnt[qbounds[:-1]]) > 0
    layer_obj = cols["layer"]
    sb_col = cols["stack_bits"].astype(np.int64)

    # ---- enumerate stacks per query -------------------------------------
    all_partials: list = []
    q_pstart: list = [0]
    _EMPTY = frozenset()
    q_ign: list = []
    for q in range(n_q):
        pm_rows = order_pm[pm_bounds[q]:pm_bounds[q + 1]].tolist()
        qidx = [IDX_l[r] for r in pm_rows]
        qmask = [MASK_l[r] for r in pm_rows]
        qzoom = [ZOOM_l[r] for r in pm_rows]
        glists = [range(koffs_l[r], koffs_l[r + 1]) for r in pm_rows]
        non_overlap = None
        if q_has_sb[q]:
            non_overlap = non_overlap_from_bits(
                {int(IDX_l[r]): int(sb_col[r]) for r in pm_rows})
        partials = _enumerate_query(pm_rows, qidx, qmask, qzoom, IDX_l,
                                    X_l, Y_l, GRW_l, glists, non_overlap,
                                    TMP_a, SD_a, mask_col)
        if partials:
            # STACKABLE_LIMIT pre-scoring cap (constants.js:20-21): only
            # the best raw-relev partials proceed to rebalance
            if len(partials) > constants.STACKABLE_LIMIT:
                g0 = np.fromiter((p[0][0][1] for p in partials), np.int64,
                                 len(partials))
                rel = np.fromiter((p[2] for p in partials), np.float64,
                                  len(partials))
                ordc = np.lexsort((TMP_a[g0], -SD_a[g0], -rel))
                # distinct-feature rescue past the cap, identical to the
                # object kernel (geocode-unit.proximity-polygon): the
                # best partial of each unrepresented top-cover tmpid is
                # re-admitted, bounded by the verify load budget

                def _top_tmpid(p):
                    e = min(p[0],
                            key=lambda e: (-IDX_l[e[0]], MASK_l[e[0]]))
                    return int(TMP_a[e[1]])

                kept_k = [int(k) for k in
                          ordc[: constants.STACKABLE_LIMIT]]
                seen_t = {_top_tmpid(partials[k]) for k in kept_k}
                extra_k: list = []
                for k in ordc[constants.STACKABLE_LIMIT:]:
                    if len(extra_k) >= \
                            constants.VERIFYMATCH_MAX_FEATURES_LIMIT:
                        break
                    t = _top_tmpid(partials[int(k)])
                    if t not in seen_t:
                        seen_t.add(t)
                        extra_k.append(int(k))
                partials = [partials[k] for k in kept_k + extra_k]
            all_partials.extend(partials)
        q_pstart.append(len(all_partials))
        if q_has_io[q]:
            rsel = order_q[qbounds[q]:qbounds[q + 1]]
            io = io_col[rsel]
            q_ign.append(frozenset(str(l) for l in layer_obj[rsel][io]))
        else:
            q_ign.append(_EMPTY)

    P = len(all_partials)
    if P == 0:
        return empty

    # ---- flatten entries (shard-level) ---------------------------------
    rows_l: list = []
    gix_l: list = []
    gr_l: list = []
    rel_l: list = []
    nent_l: list = []
    for p in all_partials:
        ent = p[0]
        nent_l.append(len(ent))
        rel_l.append(p[2])
        for e in ent:
            rows_l.append(e[0])
            gix_l.append(e[1])
            gr_l.append(e[2])
    n_ent = np.array(nent_l, dtype=np.int64)
    row_f = np.array(rows_l, dtype=np.int64)
    gix_f = np.array(gix_l, dtype=np.int64)
    gr_f = np.array(gr_l, dtype=np.float64)
    dfs_relev = np.array(rel_l, dtype=np.float64)
    starts = np.concatenate(([0], np.cumsum(n_ent)[:-1]))
    ends = starts + n_ent
    pid_f = np.repeat(np.arange(P, dtype=np.int64), n_ent)

    q_pstart_a = np.asarray(q_pstart, dtype=np.int64)
    q_pcount = np.diff(q_pstart_a)
    qord_p = np.repeat(np.arange(n_q, dtype=np.int64), q_pcount)
    qlen_q = qlen_col[order_q[qbounds[:-1]]]
    qlen_p = np.repeat(qlen_q, q_pcount)

    mask_f = mask_col[row_f]

    # ---- rebalance (spatialmatch.js:98-136), vectorized ----------------
    # operation order matches the scalar kernel exactly; floor(x*1e8+0.5)
    # /1e8 is the inlined roundTo
    stack_mask = np.bitwise_or.reduceat(mask_f, starts)
    coverage = _popcount(stack_mask)
    missing = qlen_p - coverage
    sw = np.where(missing > 0, 1.0 / (n_ent + 1), 1.0 / n_ent)
    ew_f = _popcount(mask_f) / qlen_p[pid_f]
    safe_ew = np.where(ew_f != 0.0, ew_f, 1.0)
    discount = np.where(ew_f != 0.0, gr_f / safe_ew, 0.0)
    new_relev_f = np.floor(
        (gr_f + (1.25 * sw[pid_f]) * discount) / 2.25 * 1e8 + 0.5) / 1e8
    total_w = np.add.reduceat(new_relev_f, starts)
    expected_w = np.add.reduceat(gr_f, starts)
    penalty = expected_w - dfs_relev
    relev_out = np.minimum(
        np.floor((total_w - penalty) * 1e8 + 0.5) / 1e8, 1.0)

    # ---- hierarchy-gap penalty over dense layer ranks ------------------
    ndx_f = ndx_col[row_f]
    og = np.lexsort((ndx_f, pid_f))
    sndx = ndx_f[og]
    spid = pid_f[og]
    gap = (spid[1:] == spid[:-1]) & (sndx[1:] - sndx[:-1] > 1)
    has_gap = np.zeros(P, dtype=bool)
    if gap.any():
        has_gap[np.unique(spid[1:][gap])] = True
    penalized = np.where(
        (n_ent > 1) & has_gap,
        np.floor((relev_out - 0.01) * 1e8 + 0.5) / 1e8,
        relev_out)

    # ---- final ordering (_stack_sort_key), vectorized, per query -------
    # covers order per partial: (-pm.idx, pm.mask); ord3 slices give each
    # partial's entries in that order (pid primary keeps segments)
    idx_f = idx_col[row_f]
    ord3 = np.lexsort((mask_f, -idx_f, pid_f))
    top = ord3[starts]             # covers[0] flat position per partial
    top_g = gix_f[top]
    addr_obj = cols["address"]
    addr_flag = np.fromiter(
        (1 if isinstance(a, str) and a else 0 for a in addr_obj),
        np.int64, n_rows)
    addr_key = np.where(
        np.bitwise_or.reduceat(addr_flag[row_f], starts) > 0, 0, 1)
    neg_idx_avg = -(np.add.reduceat(idx_f, starts) / n_ent)
    order_final = np.lexsort(
        (FID_a[top_g], neg_idx_avg, addr_key, idx_f[top],
         -SD_a[top_g], -penalized, qord_p))

    # ---- direction-dedup keys, vectorized -------------------------------
    # covers_typed order: (mask & -mask, pm.idx) (spatialmatch.js:53-80);
    # only the first two entries drive the direction
    lsb_f = mask_f & -mask_f
    ord4 = np.lexsort((idx_f, lsb_f, pid_f))
    t_first = ord4[starts]
    typed_tmpid = TMP_a[gix_f[t_first]].tolist()
    multi = n_ent > 1
    t_second = ord4[np.minimum(starts + 1, len(ord4) - 1)]
    is_desc = (multi & (idx_f[t_first] > idx_f[t_second])).tolist()
    multi_l = multi.tolist()
    # per-partial "any cover is partial-number"
    part_p = (np.bitwise_or.reduceat(
        partial_col[row_f].astype(np.int64), starts) > 0)
    part_l = part_p.tolist()
    pen_l = penalized.tolist()

    # ---- per-query dedup walk + chunk prune ------------------------------
    qseg = np.concatenate(([0], np.cumsum(q_pcount)))
    of_l = order_final.tolist()
    max_stacks = constants.SPATIALMATCH_STACK_LIMIT
    picked_pos: list = []       # flat partial ids, in output order
    picked_si: list = []
    picked_q: list = []
    # per query: distinct (tmpid, layer) pairs over every candidate
    # stack's covers — the strict-map payload the hydrate squishy
    # checks consume (see CAND_SCHEMA qmatch_* comment)
    q_pair_t: dict = {}
    q_pair_l: dict = {}
    q_pair_m: dict = {}
    for q in range(n_q):
        done_asc: set = set()
        done_desc: set = set()
        done_single: set = set()
        picked: list = []
        for pos in of_l[qseg[q]:qseg[q + 1]]:
            tmpid = typed_tmpid[pos]
            if multi_l[pos]:
                if is_desc[pos]:
                    if tmpid not in done_desc:
                        done_desc.add(tmpid)
                        picked.append(pos)
                else:
                    if tmpid not in done_asc:
                        done_asc.add(tmpid)
                        picked.append(pos)
            else:
                if (tmpid not in done_asc and tmpid not in done_desc
                        and tmpid not in done_single):
                    done_single.add(tmpid)
                    picked.append(pos)
            if len(picked) >= max_stacks:
                break
        # strict-map pairs from the PRE-verify-cut list (carmen builds
        # sets over every spatialmatch, verifymatch.js:767)
        pt: list = []
        pl: list = []
        pmk: list = []
        seen_pairs: set = set()
        for pos in picked:
            for j in range(starts[pos], ends[pos]):
                key = (int(TMP_a[gix_f[j]]), layer_obj[row_f[j]],
                       int(mask_f[j]))
                if key not in seen_pairs:
                    seen_pairs.add(key)
                    pt.append(key[0])
                    pl.append(key[1])
                    pmk.append(key[2])
        picked = picked[: constants.VERIFYMATCH_MAX_FEATURES_LIMIT]
        if not picked:
            continue
        q_pair_t[q] = pt
        q_pair_l[q] = pl
        q_pair_m[q] = pmk
        if not any(part_l[pos] for pos in picked):
            # pre-exchange chunk-protocol prune: verification can only
            # fail for partial-number candidates (prefix-miss
            # tombstones), so with none in the ledger the fused path's
            # chunk/backfill/early-stop outcome is already decided.
            # With no partials and all-True outcomes the
            # ChunkedVerifyPlanner replay reduces exactly to "first
            # VERIFYMATCH_STACK_LIMIT candidates": the first chunk
            # fills to batch = stack_limit, every record is ok, and
            # n_verified hits stack_limit before any backfill
            # (pinned against the planner by test_coalesce_fast_parity).
            # Replay on the shipped subset is a fixpoint, so assemble's
            # ledger replay still matches the fused path exactly.
            picked = picked[: constants.VERIFYMATCH_STACK_LIMIT]
        picked_pos.extend(picked)
        picked_si.extend(range(len(picked)))
        picked_q.extend([q] * len(picked))

    if not picked_pos:
        return empty

    # ---- Arrow-native output assembly ------------------------------------
    pos_a = np.array(picked_pos, dtype=np.int64)
    si_a = np.array(picked_si, dtype=np.int32)
    q_a = np.array(picked_q, dtype=np.int64)
    n_out = len(pos_a)

    # flat covers of all picked stacks, in covers order
    seg_list = [ord3[starts[pos]:ends[pos]] for pos in picked_pos]
    seg_cat = (np.concatenate(seg_list) if len(seg_list) > 1
               else seg_list[0])
    seg_len = n_ent[pos_a]
    cov_offs = np.concatenate(([0], np.cumsum(seg_len))).astype(np.int32)
    cov_rows = row_f[seg_cat]
    cov_gids = gix_f[seg_cat]
    cov_tmpids = TMP_a[cov_gids]
    cov_relevs = new_relev_f[seg_cat]
    cov_masks = mask_f[seg_cat]

    top_pos = ord3[starts[pos_a]]
    top_rows = row_f[top_pos]
    top_gids = gix_f[top_pos]
    tmpid_a = TMP_a[top_gids]

    # relev = direction effects over covers — vectorized fast path for
    # single-cover stacks (walk is identity there), python walk only for
    # multi-cover stacks (needs the subquery strings)
    subq_obj = cols["subquery"]
    relev_a = relev_out[pos_a].copy()
    multi_out = np.flatnonzero(seg_len > 1)
    if multi_out.size:
        cov_rows_l = cov_rows.tolist()
        cov_relevs_l = cov_relevs.tolist()
        cov_masks_l = cov_masks.tolist()
        for k in multi_out.tolist():
            lo, hi = int(cov_offs[k]), int(cov_offs[k + 1])
            rows_k = cov_rows_l[lo:hi]
            relev_a[k] = direction_effects_lists(
                [layer_obj[r] for r in rows_k],
                cov_masks_l[lo:hi],
                [subq_obj[r] for r in rows_k],
                cov_relevs_l[lo:hi],
                float(relev_a[k]),
                q_ign[int(q_a[k])])

    # address: first truthy cover address (None when none) — only stacks
    # whose partials saw an address row can have one
    addr_out = np.full(n_out, None, dtype=object)
    has_addr = np.flatnonzero(
        np.bitwise_or.reduceat(addr_flag[cov_rows], cov_offs[:-1].astype(
            np.int64)) > 0) if n_out else np.array([], dtype=np.int64)
    if has_addr.size:
        cov_rows_l2 = cov_rows.tolist()
        for k in has_addr.tolist():
            for r in cov_rows_l2[int(cov_offs[k]):int(cov_offs[k + 1])]:
                a = addr_obj[r]
                if isinstance(a, str) and a:
                    addr_out[k] = a
                    break

    q_first_row = order_q[qbounds[:-1]]
    qid_q = qids[q_first_row]
    lim_q = cols["limit"][q_first_row].astype(np.int32)
    plon_q = np.where(prox_row[q_first_row],
                      plon_col[q_first_row], np.nan).astype(np.float64)
    plat_q = np.where(prox_row[q_first_row],
                      plat_col[q_first_row], np.nan).astype(np.float64)

    vshard = (tmpid_a % constants.FSHARD_MOD).astype(np.int32)
    vskey = vshard * VSHARD_SALT + (si_a % VSHARD_SALT)

    _cov_rows_l = cov_rows.tolist()
    _offs = cov_offs.tolist()

    def _lst(values, typ):
        return pa.ListArray.from_arrays(pa.array(cov_offs),
                                        pa.array(values, type=typ))

    return pa.table({
        "query_id": pa.array(qid_q[q_a]),
        "limit": pa.array(lim_q[q_a], type=pa.int32()),
        "proximity_lon": pa.array(plon_q[q_a], from_pandas=True),
        "proximity_lat": pa.array(plat_q[q_a], from_pandas=True),
        "si": pa.array(si_a, type=pa.int32()),
        "relev": pa.array(relev_a, type=pa.float64()),
        "st_relev": pa.array(penalized[pos_a], type=pa.float64()),
        "tmpid": pa.array(tmpid_a, type=pa.int64()),
        "zoom": pa.array(zoom_col[top_rows], type=pa.int32()),
        "gx": pa.array(X_a[top_gids].astype(np.int32), type=pa.int32()),
        "gy": pa.array(Y_a[top_gids].astype(np.int32), type=pa.int32()),
        "gscore": pa.array(SC_a[top_gids], type=pa.float64()),
        "address": pa.array(addr_out, type=pa.string()),
        "top_subquery": pa.array(subq_obj[top_rows], type=pa.string()),
        "cover_text": pa.array(
            [" ".join(subq_obj[r] for r in _cov_rows_l[_offs[k]:_offs[k + 1]])
             for k in range(n_out)], type=pa.string()),
        "top_phash": pa.array(PH_a[top_gids], type=pa.int64()),
        "cover_tmpids": _lst(cov_tmpids, pa.int64()),
        "qmatch_tmpids": pa.array(
            [q_pair_t.get(int(q), []) for q in q_a],
            type=pa.list_(pa.int64())),
        "qmatch_layers": pa.array(
            [q_pair_l.get(int(q), []) for q in q_a],
            type=pa.list_(pa.string())),
        "qmatch_masks": pa.array(
            [q_pair_m.get(int(q), []) for q in q_a],
            type=pa.list_(pa.int64())),
        "cover_idxs": _lst(idx_col[cov_rows].astype(np.int32), pa.int32()),
        "cover_zooms": _lst(zoom_col[cov_rows].astype(np.int32), pa.int32()),
        "cover_sublens": _lst(
            np.fromiter((len(subq_obj[r]) for r in cov_rows.tolist()),
                        np.int32, len(cov_rows)), pa.int32()),
        "cover_masks": _lst(cov_masks, pa.int64()),
        "cover_relevs": _lst(cov_relevs, pa.float64()),
        "partial_number": pa.array(part_p[pos_a], type=pa.bool_()),
        "vshard": pa.array(vshard, type=pa.int32()),
        "vskey": pa.array(vskey, type=pa.int32()),
    }, schema=CAND_SCHEMA)
