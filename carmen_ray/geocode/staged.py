"""Staged forward-geocode pipeline — the sharded scale path.

The fused actor (engine.ForwardGeocoder) holds the whole index per
actor; that stops working when a layer's phrase/grid tables outgrow one
worker. This variant is the SURVEY.md §3.2 Ray shape with the explicit
shuffles:

    queries → mB-actor(PhrasematchStage: phrase windows → grid rows)
            → sort(__qshard, known boundaries)   # shuffle 1: hash-bucket
            → mB(coalesce: stack+rebalance+topk) #   exchange, no sampling
            → groupby(vskey)                     # shuffle 2: ONE vshard
            → map_groups(VerifyHydrate)          #   exchange; actors load
                                                 #   fshard slices lazily
            → sort(__qshard, known boundaries)   # shuffle 3
            → mB(assemble: dedupe + final sort + limit)

Forward queries only — reverse/id queries route through the fused
actor (engine.ForwardGeocoder), which is also the fast path when the
index fits an actor.

No stage holds the whole index: PhrasematchStage actors hold only a
pshard slice of the phrase/grid table (features-free IndexData — the
feature store is never built there); VerifyHydrate actors hold only the
fshard slices the vskey exchange routes to them (bounded LRU), with
context attributes denormalized onto each row at build time
(index/context.py `context_json`) so hydration never needs a
cross-shard lookup. With `index_dir` set, each actor reads its shards
straight from the partitioned parquet layout — nothing index-sized
ever lives on the driver.

Stage boundaries carry narrow Arrow rows: grids packed with the 53-bit
grid encoding (util/grid.py) — exactly what a phrase-sharded cluster
would exchange.

Proximity note: stage-2 scoredist uses the tile-corner distance (the
feature center isn't hydrated yet); VerifyHydrate recomputes the
precise scoredist before the final sort, so final ordering matches the
fused path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import constants
from ..util import grid as gridmod
from ..util.jsmath import round_to
from .coalesce import MAX_GRIDS_PER_PM  # noqa: F401  (re-export for tests)
from .engine import (
    RESULT_FIELDS,
    RESULT_SCHEMA,
    IndexData,
    _context_for,
    addr_dedupe_key_parts,
    number_only_subquery,
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
    ("stack_bits", pa.int64()),            # geocoder_stack bitset — the
                                           # coalesce stage rebuilds the
                                           # non_overlapping_indexes mask
                                           # (index.js:325-342) from it
    ("partial_number", pa.bool_()),        # bare-number prefix hypothesis
                                           # (phrasematch.js:207): grids
                                           # count only near the prox point
    ("coalesce_radius", pa.float64()),     # per-source scoredist radius
                                           # (indexer/index.js:233); 0 =
                                           # unset → zoom-scaled default
])

# one row PER CANDIDATE STACK leaving coalesce. Candidates are routed to
# the VerifyHydrate shard that owns the top cover's feature (vshard);
# the final groupby(query_id) reassembles, dedupes and ranks. `si` is
# the stack ordinal within its query — dedup tie-breaks are
# first-stack-wins in the fused path, and arrival order through two
# shuffles is nondeterministic, so the ordinal must ride along.
CAND_SCHEMA = pa.schema([
    ("query_id", pa.string()),
    ("limit", pa.int32()),
    ("proximity_lon", pa.float64()),
    ("proximity_lat", pa.float64()),
    ("si", pa.int32()),
    ("relev", pa.float64()),        # post direction-effects, unrounded
    ("st_relev", pa.float64()),     # raw stack relev — the chunk
                                    # protocol's early-stop tier key
    ("tmpid", pa.int64()),          # top cover's grid tmpid
    ("zoom", pa.int32()),           # top cover's pm zoom
    ("gx", pa.int32()),             # top cover's grid x
    ("gy", pa.int32()),             # top cover's grid y
    ("gscore", pa.float64()),       # top cover's grid score
    ("address", pa.string()),
    ("top_subquery", pa.string()),  # matching_text derivation
    ("cover_text", pa.string()),    # all cover subqueries joined, in
                                    # covers() order — the uniqueAddressId
                                    # dedupe key's text half
    ("top_phash", pa.int64()),      # source text hash of top cover
    ("cover_tmpids", pa.list_(pa.int64())),
    # query-wide distinct (tmpid, layer) cover pairs across ALL of this
    # query's candidate stacks — carmen's strict map
    # (verifymatch.js:767-776) spans every spatialmatch, so the squishy
    # grant/inherit checks in VerifyHydrate need more than this row's
    # own covers (promote-on-identical-name). Replicated per candidate;
    # hydrate filters by the config's grant/inherit layer sets.
    ("qmatch_tmpids", pa.list_(pa.int64())),
    ("qmatch_layers", pa.list_(pa.string())),
    ("qmatch_masks", pa.list_(pa.int64())),
    ("cover_idxs", pa.list_(pa.int32())),
    ("cover_zooms", pa.list_(pa.int32())),
    ("cover_sublens", pa.list_(pa.int32())),
    ("cover_masks", pa.list_(pa.int64())),
    ("cover_relevs", pa.list_(pa.float64())),
    ("partial_number", pa.bool_()),  # any cover from a partial-number pm
                                     # (spatialmatch.js:198-204 x300 boost,
                                     # prefix-only address resolution)
    ("vshard", pa.int32()),         # fid % FSHARD_MOD of the top cover
    ("vskey", pa.int32()),          # vshard * SALT + si % SALT — the verify
                                    # exchange key: one groupby(vskey) routes
                                    # every candidate to exactly one group
                                    # whose rows all share a vshard, so the
                                    # hydrate pool reads each feature shard
                                    # at most SALT times total (no per-pool
                                    # full-candidate re-scan)
])

# verify-exchange salt: groups per feature shard. More salt = more
# parallel groups (finer tasks, better balance across the hydrate pool)
# at the cost of more per-group shard binds (bounded by the per-actor
# LRU — per-actor shard loads stay ≤ FSHARD_MOD regardless of salt).
# 64 groups starved a 30-actor pool (verify scaled 1.27× for 4× CPUs);
# 256 fed every pool size; 64 × FSHARD_MOD(16) = 1024 also smooths the
# sort-partition quantization (boundaries can only land between groups,
# so more groups ⇒ more even partitions ⇒ smaller stragglers — r4
# measured half2 21.1 → 17.3 s at 32 CPUs going 256 → 1024).
VSHARD_SALT = 64

# hydrated candidate rows (VerifyHydrate output): everything assemble
# needs to dedupe/sort/rank without touching the index again
_HYD_FIELDS = [
    ("query_id", pa.string()), ("limit", pa.int32()), ("si", pa.int32()),
    ("tmpid", pa.int64()),
    ("feature_id", pa.string()), ("relevance", pa.float64()),
    ("composite", pa.float64()), ("place_name", pa.string()),
    ("center_lon", pa.float64()), ("center_lat", pa.float64()),
    ("fzoom", pa.int32()),
    ("context", pa.list_(pa.string())), ("score", pa.float64()),
    ("scoredist", pa.float64()), ("idx", pa.int32()), ("fid", pa.int64()),
    ("address", pa.string()),
    ("routable_lon", pa.float64()), ("routable_lat", pa.float64()),
    ("matching_text", pa.string()), ("matching_language", pa.string()),
    ("language", pa.string()),
    # AM-aware output bbox scalars (all None for point features)
    ("bbox_w", pa.float64()), ("bbox_s", pa.float64()),
    ("bbox_e", pa.float64()), ("bbox_n", pa.float64()),
    # chunk-protocol replay ledger (verifymatch.js:85-227): raw stack
    # relev, partial flag, and whether this candidate verified — failed
    # candidates arrive as tombstone rows so assemble can replay the
    # fused path's backfill/early-stop decisions exactly
    ("st_relev", pa.float64()), ("partial_number", pa.bool_()),
    ("verified_ok", pa.bool_()),
    # duplicate-address dedupe/sort inputs (format-features.js:252-374,
    # verifymatch.js:990,1015-1024): omitted-geometry demotion +
    # replacement preference, interpolated replacement preference, and
    # the uniqueAddressId second dedupe key
    ("omitted", pa.bool_()), ("interpolated", pa.bool_()),
    ("addr_key", pa.string()),
]
HYD_SCHEMA = pa.schema(_HYD_FIELDS)


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
    stack_bits: int
    partial_number: bool = False


class PackedCollector:
    """phrasematch_query collector that packs grid slices straight from
    the numpy phrase-grid columns — no Grid/Phrasematch objects, no
    re-encode (that was ~40% of staged phrasematch time)."""

    def __init__(self):
        self.entries: list[_PackedRow] = []

    def emit(self, index, idx, rel, mask, weight, joined, use_prefix,
             address, edit_distance, lang_want=None):
        from .engine import _lang_penalties

        c = index.pg_cols
        # score3 is re-derived at verify, so its low bit carries the
        # cross-language mismatch flag instead — the exchange's 2-bit
        # relev bucket can't hold a ×0.96 float, so the penalty is
        # re-applied after decode (coalesce_fast / the pm prune).
        # Category subqueries are language-universal (no penalty —
        # language-universal-categories acceptance).
        import numpy as _np

        _layer0 = str(c["layer"][rel[0]])
        if joined in index.layer_categories.get(_layer0, ()):
            pen = _np.ones(len(rel))
        else:
            pen = _lang_penalties(index, c, rel, lang_want)
        packed = gridmod.encode(
            c["x"][rel], c["y"][rel], c["relev"][rel],
            (pen < 1.0).astype(np.int64),
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
            stack_bits=getattr(index, "stack_bits", {}).get(int(idx), 0),
        ))


def _pg_shard_filter(phrase_grid: pa.Table, shard: int, of_n: int) -> pa.Table:
    """In-memory phrase-shard slice, same key as the parquet layout:
    pshard = (phrase_id >> 40) % PSHARD_MOD, actor owns pshard % of_n."""
    pids = np.asarray(phrase_grid["phrase_id"], dtype=np.int64) >> 40
    return phrase_grid.filter(pa.array((pids % constants.PSHARD_MOD) % of_n == shard))


class PhrasematchStage:
    """Actor: queries → phrasematch rows. Holds ONLY its pshard slice of
    the phrase/grid table — the IndexData is features-free (no feature
    store, tmpid index or cell index is ever built here).

    Construction modes:
      * index_dir=...: the actor reads its own shard from the
        partitioned parquet layout (build_index_streaming output) and
        the scalar metadata from index_meta.json — nothing shipped from
        the driver but the path and shard coordinates.
      * phrase_grid=... (tables): compact/test mode; `features` is
        accepted for backward compatibility but only consulted to derive
        idx_rank when none is given.
    """

    def __init__(self, features=None, phrase_grid=None, freq=None,
                 max_score=None, layer_zooms=None, config=None,
                 shard: int = 0, of_n: int = 1, index_dir: str | None = None,
                 idx_rank: dict | None = None, layer_bounds: dict | None = None):
        if index_dir is not None:
            from ..index.build import load_index_meta, read_phrase_shard

            meta = load_index_meta(index_dir)
            phrase_grid = read_phrase_shard(index_dir, shard, of_n)
            freq = meta["freq"]
            max_score = meta["max_score"]
            layer_zooms = meta["layer_zooms"]
            idx_rank = meta["idx_rank"]
            layer_bounds = meta.get("layer_bounds", {})
        else:
            layer_bounds = dict(layer_bounds or {})
            if not layer_bounds and features is not None and features.num_rows \
                    and "bbox_w" in features.column_names:
                lbdf = features.select(
                    ["layer", "bbox_w", "bbox_s", "bbox_e", "bbox_n"]
                ).to_pandas().groupby("layer").agg(
                    {"bbox_w": "min", "bbox_s": "min",
                     "bbox_e": "max", "bbox_n": "max"})
                layer_bounds = {
                    l: [float(r.bbox_w), float(r.bbox_s),
                        float(r.bbox_e), float(r.bbox_n)]
                    for l, r in lbdf.iterrows()}
            if of_n > 1:
                phrase_grid = _pg_shard_filter(phrase_grid, shard, of_n)
            if idx_rank is None and features is not None:
                pairs = sorted(set(zip(features["layer"].to_pylist(),
                                       features["idx"].to_pylist())),
                               key=lambda t: t[1])
                idx_rank = {int(ix): r for r, (_, ix) in enumerate(pairs)}
        self.index = IndexData(None, phrase_grid, freq, max_score,
                               layer_zooms, config=config, presorted=True,
                               idx_rank=idx_rank, layer_bounds=layer_bounds)

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
        from .engine import (
            filter_misspelled_short,
            intersection_phrasematches,
            number_order_of,
        )

        rows = {name: [] for name in PM_SCHEMA.names}
        # proximity is both-or-neither from here on: a malformed row
        # with lon set but lat null/NaN (or vice versa) must not let
        # half the pipeline treat it as a proximity query — downstream
        # gates (coalesce prox pass, _prune_grids, verify) key on lon
        # alone, so normalize once at ingest
        plon = [lo if (lo is not None and lo == lo
                       and la is not None and la == la) else None
                for lo, la in zip(plon, plat)]
        plat = [la if lo is not None else None
                for lo, la in zip(plon, plat)]
        for qid, q, lo, la, lim in zip(qids, queries, plon, plat, lims):
            if self.index.global_rules:
                q = replace_global_tokens(self.index.global_rules, q)
            tq0 = tokenize(q)
            if getattr(self.index, "complex_query_rules", None):
                from ..text.token_replacer import replace_token

                tq0 = replace_token(self.index.complex_query_rules, tq0)
            tq = normalize_query(tq0)
            tokens = tq.tokens[: constants.MAX_QUERY_TOKENS]
            # ending type, identical to the fused path: trailing
            # separator / replaced final word → wordBoundaryPrefix
            last_word = tq.last_word
            ends_in_boundary = bool(tokens) and tq.separators[len(tokens) - 1] != ""
            if self.index.simple:
                tokens, changed_last = self.index.simple.replace_query(tokens)
                last_word = last_word or changed_last
            if not tokens:
                continue
            word_boundary = last_word or ends_in_boundary
            col = PackedCollector()
            tried: set = set()
            fz = 1 if len(tokens) <= constants.MAX_CORRECTION_LENGTH else 0
            for hyp, penalty in query_hypotheses(self.index, tokens, fuzzy=False):
                if len(hyp) != len(tokens):
                    continue
                phrasematch_query(self.index, hyp, weight_multiplier=penalty,
                                  word_boundary=word_boundary,
                                  seen=tried, fuzzy_max_distance=fz, collector=col)
            intersection_phrasematches(self.index, tokens, col, seen=tried)
            for var_tokens, addr in num_tokenize(tokens):
                phrasematch_query(self.index, var_tokens, seen=tried,
                                  word_boundary=word_boundary,
                                  address=addr["number"], collector=col,
                                  fuzzy_max_distance=fz,
                                  number_order=number_order_of(var_tokens, addr))
                if addr["position"] > 0:
                    swapped = [var_tokens[addr["position"]]] + [
                        t for i, t in enumerate(var_tokens) if i != addr["position"]]
                    phrasematch_query(self.index, swapped, weight_multiplier=0.99,
                                      word_boundary=word_boundary,
                                      seen=tried, address=addr["number"], collector=col,
                                      fuzzy_max_distance=fz,
                                      number_order="first")

            # bare-number prefix hypothesis, proxMatch-gated exactly like
            # the fused path (phrasematch.js:185-232): with proximity
            # inside an address source's bounds, the raw token and its
            # waffle variants all become partial_number/nearby-only pms
            if len(tokens) == 1 and tokens[0].isdigit() and lo is not None:
                from ..text.termops import num_tokenize_prefix
                from ..util.bbox import am_inside

                prox_layers = {
                    l for l in self.index.address_layers
                    if l in self.index.layer_bounds
                    and am_inside((float(lo), float(la)),
                                  list(self.index.layer_bounds[l]))}
                if prox_layers:
                    for e in col.entries:
                        if e.layer in prox_layers and number_only_subquery(e.subquery):
                            e.partial_number = True
                            e.address = tokens[0]
                    n0 = len(col.entries)
                    for var in num_tokenize_prefix(tokens):
                        phrasematch_query(self.index, var, seen=tried,
                                          word_boundary=word_boundary,
                                          address=tokens[0], collector=col)
                    kept = [e for e in col.entries[n0:] if e.layer in prox_layers]
                    for e in kept:
                        e.partial_number = True
                    col.entries[n0:] = kept
            # number-only single-token subqueries never match address
            # sources outside the partial-number state (phrasematch.js:225)
            col.entries = [
                e for e in col.entries
                if not (e.layer in self.index.address_layers
                        and number_only_subquery(e.subquery)
                        and not e.partial_number)]

            pms = self._prune_grids(filter_misspelled_short(col.entries), lo, la)
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
                rows["partial_number"].append(bool(getattr(pm, "partial_number", False)))
                rows["coalesce_radius"].append(
                    float(self.index.layer_coalesce_radius.get(pm.layer, 0.0)))
                rows["ndx"].append(pm.ndx)
                rows["stack_bits"].append(pm.stack_bits)
        # __qshard computed here rather than in a downstream
        # map_batches(add_qshard): an actor-pool op can't fuse with a
        # task op, so the separate pass re-serialized every (wide) pm
        # block through the object store once more
        return add_qshard(pa.table(
            {n: pa.array(rows[n], type=PM_SCHEMA.field(n).type)
             for n in PM_SCHEMA.names}))

    def _prune_grids(self, pms, lo, la):
        """Apply stack_and_coalesce's per-pm grid caps BEFORE the
        exchange (it has the proximity point, so scoredist is
        computable here): the partial-number nearby-only filter, then
        the best-MAX_GRIDS_PER_PM cut in the exact sorted order the
        downstream prune would produce (grid_prox_arrays is shared, so
        the scoredist floats — and hence the ordering — are
        bit-identical). Hot phrases hold hundreds of grids; shipping
        only what coalesce can use cuts the widest exchange ~payload
        proportionally. Downstream's own filter+prune still run and
        are no-ops on pre-pruned rows (table-mode and test callers may
        bypass this stage)."""
        from .coalesce import MAX_GRIDS_PER_PM

        import os as _os

        # default OFF: on the bench corpus the mean pm row holds ~13
        # grids (few phrases exceed the 64-grid cap), so the extra
        # phrasematch-side pass isn't repaid — and the phrasematch pool
        # is the CPU-capped stage at small cluster sizes (measured ~15%
        # slower 8-CPU leg with it on, no consistent 32-CPU win under
        # host noise). Turn ON for corpora with whale phrases (hot
        # street/place names at web scale hold hundreds-to-thousands of
        # grids per phrase window), where shipping grids the coalesce
        # prune will discard dominates the exchange; outputs are
        # bit-identical either way (test_pm_prune_parity).
        if _os.environ.get("GRAFT_PM_PRUNE", "0") == "0":
            return pms
        # same gate as the coalesce stage (lon alone, NaN-safe) — ingest
        # normalizes proximity to both-or-neither, so keying on lon here
        # can never diverge from downstream ordering
        has_prox = lo is not None and lo == lo
        work = [(k, pm) for k, pm in enumerate(pms)
                if (has_prox and getattr(pm, "partial_number", False))
                or len(pm.grids) > MAX_GRIDS_PER_PM]
        if not work:
            return pms

        # one proximity pass over the concatenated grids of every row
        # that needs pruning (per-row numpy calls were overhead-bound —
        # same batching trick as coalesce_group)
        packed = {}
        scores_by = {}
        if has_prox:
            xs, ys, ns, zs, ss, cr = [], [], [], [], [], []
            for k, pm in work:
                g = np.asarray(pm.grids, dtype=np.uint64)
                dec = gridmod.decode(g)
                packed[k] = (g, dec)
                m = len(pm.grids)
                xs.append(dec["x"].astype(np.float64))
                ys.append(dec["y"].astype(np.float64))
                ns.append(np.full(m, 2.0 ** int(pm.zoom)))
                zs.append(np.full(m, int(pm.zoom), dtype=np.int64))
                sc = np.asarray(pm.grid_scores, dtype=np.float64)
                scores_by[k] = sc
                ss.append(sc)
                cr.append(np.full(m, float(
                    self.index.layer_coalesce_radius.get(pm.layer, 0.0))))
            dist_all, sd_all = grid_prox_arrays(
                np.concatenate(xs), np.concatenate(ys), np.concatenate(ns),
                np.concatenate(zs), np.concatenate(ss), np.concatenate(cr),
                lo, la, float(self.index.max_score))
        else:
            for k, pm in work:
                g = np.asarray(pm.grids, dtype=np.uint64)
                packed[k] = (g, gridmod.decode(g))
                scores_by[k] = np.asarray(pm.grid_scores, dtype=np.float64)

        dropped = set()
        off = 0
        for k, pm in work:
            g, dec = packed[k]
            n_g = len(pm.grids)
            scores = scores_by[k]
            if has_prox:
                dist = dist_all[off:off + n_g]
                sd = sd_all[off:off + n_g]
                off += n_g
            else:
                dist = None
                sd = scores
            keep = np.arange(n_g)
            if has_prox and getattr(pm, "partial_number", False):
                crad = float(self.index.layer_coalesce_radius.get(pm.layer, 0.0))
                r = crad or float(constants.COALESCE_PROXIMITY_RADIUS)
                keep = keep[dist <= r]
                if keep.size == 0:
                    dropped.add(k)  # coalesce_group would drop the pm too
                    continue
            if keep.size > MAX_GRIDS_PER_PM:
                # same language-penalized relev the coalesce kernel
                # orders by (score3 bit0 = mismatch flag)
                relev = dec["relev"][keep] * np.where(
                    (dec["score"][keep].astype(np.int64) & 1).astype(bool),
                    constants.LANGUAGE_PENALTY, 1.0)
                sdk = sd[keep]
                tmpid = pm.idx * (1 << 25) + dec["id"][keep]
                # stable ascending by (-relev, -scoredist, tmpid) ==
                # sorted(key=(-g.relev, -g.scoredist, g.tmpid)); the cap
                # keeps the first MAX distinct tmpids' grids COMPLETE
                # (the downstream kept-tmpid cut — cells of a kept
                # polygon must all survive)
                order = np.lexsort((tmpid, -sdk, -relev))
                ts = tmpid[order]
                _, first_idx, inv = np.unique(ts, return_index=True,
                                              return_inverse=True)
                drank = np.argsort(np.argsort(first_idx))[inv]
                order = order[drank < MAX_GRIDS_PER_PM]
                keep = keep[order]
            if keep.size != n_g:
                pm.grids = g[keep].tolist()
                pm.grid_scores = scores[keep].tolist()
                ph = pm.phashes
                pm.phashes = [ph[j] for j in keep.tolist()]
        if dropped:
            return [pm for k, pm in enumerate(pms) if k not in dropped]
        return pms


# query-shard bucket count: uniform by construction (hash of query_id),
# so exchange boundaries over it are computable without sampling
QSHARD_MOD = 2048


def add_qshard(t: pa.Table) -> pa.Table:
    """Append the coarse query shard (2048 values: the sort exchange can
    only place partition boundaries between bucket values, so finer
    buckets ⇒ more even partitions ⇒ smaller coalesce stragglers — r4
    measured half1 33.0 → 28.9 s at 32 CPUs going 256 → 2048) WITHOUT
    converting the block to pandas — only the query_id column leaves
    Arrow for the hash; the wide grid/cover list columns stay
    zero-copy."""
    import pandas as pd

    h = pd.util.hash_pandas_object(
        t.column("query_id").to_pandas(), index=False).to_numpy()
    return t.append_column(
        "__qshard", pa.array((h % QSHARD_MOD).astype(np.int32), type=pa.int32()))


def grid_prox_arrays(all_x, all_y, all_n, all_zoom, all_scores, all_crad,
                     plon, plat, max_score):
    """(distance, scoredist) per grid cover — the single source of truth
    for coalesce_group AND the phrasematch-side top-K grid prune: the
    prune must order grids by bit-identical scoredist values or the
    staged path diverges from the fused path."""
    from ..util.proximity import (
        _VARIANCE_CONSTANT,
        gauss,
        haversine_miles,
        scale_radius,
        score_weight,
    )

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
    radii = np.array([scale_radius(int(z)) for z in (6, 12, 14)])
    r_sel = np.where(all_zoom <= 6, radii[0], np.where(all_zoom <= 12, radii[1], radii[2]))
    r_sel = np.where(all_crad > 0, all_crad, r_sel)
    dist_w = 9.0 * gauss(all_dist / r_sel * 3.0, _VARIANCE_CONSTANT) + 1.0
    all_sd = dist_w * score_weight(all_scores, 0.0, max_score)
    return all_dist, all_sd


def coalesce_shard(shard_group: pa.Table):
    """One shuffle group per query-id shard; queries are grouped and
    coalesced inside by the shard-level array kernel (coalesce_fast:
    one decode / proximity / prune / rebalance / sort pass over the
    whole shard, per-query Python only for the stack enumeration and
    direction dedup). Arrow in / Arrow out. Returns an Arrow table in
    CAND_SCHEMA (one row per candidate stack)."""
    from .coalesce_fast import coalesce_shard_table

    import os as _os

    if _os.environ.get("GRAFT_COAL_DEBUG") == "1":
        import time as _time

        t0 = _time.perf_counter()
        out = coalesce_shard_table(shard_group)
        dt = _time.perf_counter() - t0
        print(f"[coal] rows={shard_group.num_rows} out={out.num_rows} "
              f"chunks={shard_group.column('grids').num_chunks} {dt:.3f}s",
              flush=True)
        return out
    return coalesce_shard_table(shard_group)



class _CtxRow:
    """Denormalized context entry (index/context.py `context_json`):
    quacks like a Feature for the verify-side context consumers."""

    __slots__ = ("doc_id", "layer", "idx", "fid", "text", "score")

    def __init__(self, d: dict):
        self.doc_id = d["doc_id"]
        self.layer = d["layer"]
        self.idx = d["idx"]
        self.fid = d["fid"]
        self.text = d["text"]
        self.score = d["score"]


def _hyd_tombstone(rows, d, ri) -> None:
    """Failed-candidate marker row: carries only the replay-ledger
    fields so assemble can reconstruct the chunk protocol's view."""
    for name, _ in _HYD_FIELDS:
        if name == "query_id":
            rows[name].append(d["query_id"][ri])
        elif name == "limit":
            rows[name].append(int(d["limit"][ri]))
        elif name == "si":
            rows[name].append(int(d["si"][ri]))
        elif name == "tmpid":
            rows[name].append(int(d["tmpid"][ri]))
        elif name == "st_relev":
            rows[name].append(float(d["st_relev"][ri]))
        elif name == "partial_number":
            rows[name].append(bool(d["partial_number"][ri]) if "partial_number" in d else False)
        elif name == "verified_ok":
            rows[name].append(False)
        else:
            rows[name].append(None)


def empty_phrase_grid() -> pa.Table:
    """Schema-complete zero-row phrase/grid table for feature-only
    IndexData construction (verify shards, lean reverse/id actors)."""
    return pa.table({
        "phrase": pa.array([], type=pa.string()),
        "idx": pa.array([], type=pa.int32()),
        "layer": pa.array([], type=pa.string()),
        "zoom": pa.array([], type=pa.int32()),
        "relev": pa.array([], type=pa.float64()),
        "score": pa.array([], type=pa.float64()),
        "x": pa.array([], type=pa.int32()),
        "y": pa.array([], type=pa.int32()),
        "fid": pa.array([], type=pa.int64()),
        "phrase_id": pa.array([], type=pa.int64()),
        "lang_set": pa.array([], type=pa.uint64()),
    })


class VerifyHydrate:
    """Actor: candidate rows (CAND_SCHEMA) → hydrated rows (HYD_SCHEMA).

    The verify exchange (groupby on `vskey`) routes every candidate
    group to exactly one actor call, and all rows of a group share a
    vshard — so actors load feature shards LAZILY, one hive fshard
    slice per vshard they actually see, and the pool collectively reads
    each shard at most VSHARD_SALT times. No actor ever holds the whole
    feature table; the driver ships only the path. Context attributes
    are read from the denormalized `context_json` column, so hydration
    never needs a cross-shard lookup.

    Construction modes mirror PhrasematchStage: index_dir (actors read
    fshard slices from the hive-partitioned parquet on demand) or an
    in-memory features table (sliced per vshard on demand; test mode).
    An LRU bound (_MAX_RESIDENT_SHARDS) caps resident slices — at
    100 TB each slice is features/FSHARD_MOD and a cache miss is one
    partition-pruned parquet read. The bound must be ≥ the distinct
    vshards an actor actually sees: under the vskey exchange that's
    groups/actors (small); for mixed-shard batches (test mode, no
    exchange) it's up to FSHARD_MOD, so the local default covers the
    full modulus — a sub-FSHARD_MOD cap with mixed batches re-reads
    shards EVERY batch (measured 13× slower)."""

    _MAX_RESIDENT_SHARDS = max(8, constants.FSHARD_MOD)

    def __init__(self, features=None, freq=None, max_score=None,
                 layer_zooms=None, config=None, index_dir: str | None = None,
                 idx_rank: dict | None = None):
        self._index_dir = index_dir
        self._features = features
        self._config = config
        self._freq = freq or {}
        if index_dir is not None:
            from ..index.build import load_index_meta

            meta = load_index_meta(index_dir)
            max_score = meta["max_score"]
            layer_zooms = meta["layer_zooms"]
            idx_rank = meta["idx_rank"]
        self._max_score = max_score
        self._layer_zooms = layer_zooms
        self._idx_rank = idx_rank
        # vshard → (IndexData, per-feature context cache); insertion
        # order doubles as LRU order
        self._shards: dict[int, tuple] = {}
        # bound to the current group's shard by __call__
        self.index: IndexData | None = None
        self._ctx_cache: dict[int, list] = {}
        self._feat_cache: dict[int, object] = {}
        self._disp_cache: dict[int, tuple] = {}

    def _bind_shard(self, vshard: int) -> None:
        ent = self._shards.get(vshard)
        if ent is None:
            if self._index_dir is not None:
                from ..index.build import read_feature_shard

                feats = read_feature_shard(
                    self._index_dir, vshard, constants.FSHARD_MOD)
            else:
                fids = np.asarray(self._features["fid"], dtype=np.int64)
                feats = self._features.filter(
                    pa.array(fids % constants.FSHARD_MOD == vshard))
            # verify never probes phrases or cell rings — skip those
            idx = IndexData(feats, empty_phrase_grid(), self._freq,
                            self._max_score, self._layer_zooms,
                            config=self._config, presorted=True,
                            idx_rank=self._idx_rank, build_cell_index=False)
            if len(self._shards) >= self._MAX_RESIDENT_SHARDS:
                self._shards.pop(next(iter(self._shards)))
            ent = (idx, {}, {}, {})
            self._shards[vshard] = ent
        else:
            # refresh LRU position
            self._shards.pop(vshard)
            self._shards[vshard] = ent
        self.index, self._ctx_cache, self._feat_cache, self._disp_cache = ent

    def _feat(self, frow: int):
        """Materialized feature row: the lazy Feature proxy pays a dict
        lookup + numpy scalar extraction per attribute access and the
        verify loop reads ~15 attributes per candidate — hot features
        repeat across candidates, so build a plain-attribute namespace
        once per row and cache it in the shard's LRU entry. Values are
        exactly what the proxy would have returned (same column
        extraction); absent columns raise AttributeError either way."""
        f = self._feat_cache.get(frow)
        if f is None:
            from types import SimpleNamespace

            f = SimpleNamespace(
                **{col: arr[frow] for col, arr in self.index._f.items()})
            self._feat_cache[frow] = f
        return f

    def _ctx(self, frow: int, feature):
        """Context chain for a feature row: denormalized column when the
        index was built with it, else the legacy full-table walk (valid
        only in unsharded mode)."""
        cached = self._ctx_cache.get(frow)
        if cached is not None:
            return cached
        if self.index._f is not None and "context_json" in self.index._f:
            import json as _json

            raw = self.index._f["context_json"][frow]
            out = [_CtxRow(d) for d in _json.loads(raw)] if raw else []
        else:
            out = _context_for(self.index, frow, int(feature.idx))
        self._ctx_cache[frow] = out
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        """One input row = one candidate stack. Mirrors the fused
        forward_one verify loop: precise feature-center proximity
        (min(center, furthest-tile-corner) bound like attach_proximity),
        context squishy, squishy score inheritance, matching_text; the
        per-query dedup/sort/limit happens downstream in assemble."""
        import json as _json

        from ..geom.ops import nearest_point_on_multiline
        from ..util import proximity as prox
        from .engine import (
            TMPID_SHIFT,
            _display_text,
            _squishy_boost,
            close_but_no_cigar_adj,
            get_matching_text,
        )

        d = batch.to_pydict()
        rows = {name: [] for name, _ in _HYD_FIELDS}
        # one exchange group shares a vshard; handle mixed batches (test
        # callers) by visiting rows in vshard-grouped order
        vs = np.asarray(d["vshard"], dtype=np.int64)
        row_order = (np.argsort(vs, kind="mergesort").tolist()
                     if len(vs) else [])
        vs_l = vs.tolist()
        plon_l = d["proximity_lon"]
        plat_l = d["proximity_lat"]
        tmpid_l = d["tmpid"]
        addr_l = d["address"]

        # ---- batched proximity pre-pass --------------------------------
        # resolve feature rows once, then compute dist + base scoredist
        # for every proximity row with THE SAME numpy ufunc formulas as
        # the fused path's attach_proximity (engine.py) — the previous
        # math-module scalar "fast path" differed from numpy in the last
        # ulp (libm vs SIMD kernels, radians-of-difference vs
        # difference-of-radians), which tools/make_goldens' staged==fused
        # second-source check caught on 2.3% of sf0.01 rows. numpy ufuncs
        # are value-stable across array shapes, so one batch-wide pass
        # reproduces the fused per-pm arrays bit-exactly.
        frows: list = []
        bound = None
        for ri in row_order:
            if bound != vs_l[ri]:
                bound = vs_l[ri]
                self._bind_shard(bound)
            frows.append(self.index.row_by_tmpid(tmpid_l[ri]))
        dist_by_ri: dict = {}
        sdist_by_ri: dict = {}
        psel = [(k, ri) for k, ri in enumerate(row_order)
                if plon_l[ri] is not None and frows[k] is not None]
        if psel:
            px = np.array([plon_l[ri] for _, ri in psel])
            py = np.array([plat_l[ri] for _, ri in psel])
            # feature centers via the per-shard materialized rows
            bound = None
            clon = np.empty(len(psel))
            clat = np.empty(len(psel))
            crad = np.empty(len(psel))
            for j, (k, ri) in enumerate(psel):
                if bound != vs_l[ri]:
                    bound = vs_l[ri]
                    self._bind_shard(bound)
                f = self._feat(frows[k])
                clon[j] = f.center_lon
                clat[j] = f.center_lat
                r = self.index.layer_coalesce_radius.get(f.layer)
                crad[j] = r if r else 0.0
            gx = np.array([d["gx"][ri] for _, ri in psel], dtype=np.float64)
            gy = np.array([d["gy"][ri] for _, ri in psel], dtype=np.float64)
            zoom_a = np.array([d["zoom"][ri] for _, ri in psel],
                              dtype=np.int64)
            gscore_a = np.array([d["gscore"][ri] for _, ri in psel])
            center_d = prox.haversine_miles(px, py, clon, clat)
            nz = 2.0 ** zoom_a
            max_corner = np.zeros(len(psel))
            for dx in (0.0, 1.0):
                for dy in (0.0, 1.0):
                    lon = (gx + dx) / nz * 360.0 - 180.0
                    lat = np.degrees(np.arctan(
                        np.sinh(np.pi * (1 - 2 * (gy + dy) / nz))))
                    dd = prox.haversine_miles(px, py, lon, lat)
                    max_corner = np.maximum(max_corner, dd)
            dist_a = np.minimum(center_d, max_corner)
            # scoredist with the per-source geocoder_coalesce_radius
            # override, exactly like attach_proximity (the top cover IS
            # this feature, so its layer radius applies); zoom→radius
            # mapped like scale_radius, vectorized
            radii = np.array([prox.scale_radius(int(z)) for z in (6, 12, 14)])
            r_sel = np.where(zoom_a <= 6, radii[0],
                             np.where(zoom_a <= 12, radii[1], radii[2]))
            r_sel = np.where(crad > 0, crad, r_sel)
            dw = 9.0 * prox.gauss(dist_a / r_sel * 3.0,
                                  prox._VARIANCE_CONSTANT) + 1.0
            sd_a = dw * prox.score_weight(
                gscore_a, self.index.min_score, self.index.max_score)
            for j, (_, ri) in enumerate(psel):
                dist_by_ri[ri] = float(dist_a[j])
                sdist_by_ri[ri] = float(sd_a[j])

        bound = None
        for k, ri in enumerate(row_order):
            if bound != vs_l[ri]:
                bound = vs_l[ri]
                self._bind_shard(bound)
            plon, plat = plon_l[ri], plat_l[ri]
            has_prox = plon is not None
            tmpid = tmpid_l[ri]
            frow = frows[k]
            if frow is None:
                _hyd_tombstone(rows, d, ri)
                continue
            feature = self._feat(frow)
            if getattr(feature, "reverse_only", False):
                # carmen:reverse_only drop, same as the fused path
                # (verifymatch.js:472)
                _hyd_tombstone(rows, d, ri)
                continue
            ctx = self._ctx(frow, feature)
            addr_number = addr_l[ri]
            partial = bool(d["partial_number"][ri]) if "partial_number" in d else False
            if addr_number and partial:
                # prefix-only resolution; prefix-miss features are
                # dropped like the fused path (verifymatch.js:404-416)
                from .engine import resolve_address_prefix

                resolved = resolve_address_prefix(
                    feature, addr_number,
                    (plon, plat) if has_prox else None)
                if resolved is None:
                    _hyd_tombstone(rows, d, ri)
                    continue
                addr_state: object = resolved["address"]
            elif addr_number:
                # addr_state mirrors the fused path's carmen:address
                # (verifymatch.js:397-463): number / False / None
                if feature.addr_numbers_json or feature.addr_range_json:
                    resolved = resolve_address(feature, addr_number)
                    addr_state = resolved["address"] if resolved else False
                else:
                    resolved = None
                    addr_state = None
            else:
                resolved = None
                addr_state = "n/a"
            matched_address = resolved["address"] if resolved else None
            routable = None
            if resolved and resolved.get("line"):
                routable = nearest_point_on_multiline(
                    resolved["lon"], resolved["lat"], [resolved["line"]])
            gscore = float(d["gscore"][ri])
            if has_prox:
                dist = dist_by_ri[ri]
                scoredist = sdist_by_ri[ri]
            else:
                dist = 0.0
                scoredist = gscore
            if has_prox and resolved is not None:
                # resolved-point proximity, identical to the fused path
                # (verifymatch.js:450,483)
                dist = float(prox.distance(
                    (plon, plat), (resolved["lon"], resolved["lat"]),
                    int(d["gx"][ri]), int(d["gy"][ri]), int(d["zoom"][ri])))
                scoredist = float(prox.scoredist(
                    float(feature.score), self.index.min_score,
                    self.index.max_score, dist, int(feature.zoom),
                    radius=self.index.layer_coalesce_radius.get(
                        str(feature.layer))))
            if partial:
                # partial-number boost (spatialmatch.js:198-204), same
                # ordering as the fused path: boost first, then the
                # feat_radius / squishy overrides below may replace it
                scoredist *= 300

            disp = self._disp_cache.get(frow)
            if disp is None:
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
                disp = (display, matched_lang, ctx_names)
                self._disp_cache[frow] = disp
            else:
                display, matched_lang, ctx_names = disp
            from .engine import render_feature_format

            _ffmt = render_feature_format(
                self.index, feature, display, ctx, ctx_names,
                matched_address, matched_lang)
            if _ffmt is not None:
                place_name = _ffmt
            elif self.index.config is not None \
                    and self.index.config.place_format:
                place_name = self.index.config.render_place_name(
                    display, ctx_names, matched_address, language=matched_lang)
            else:
                name_prefix = f"{matched_address} " if matched_address else ""
                place_name = name_prefix + ", ".join([display] + ctx_names)
            matching_text, matching_language = get_matching_text(
                self.index, feature, int(d["top_phash"][ri]), None,
                d["top_subquery"][ri], matched_lang, display)

            ghost = float(feature.score) < 0
            relevance = float(d["relev"][ri])
            ao = self.index.layer_address_order.get(str(feature.layer))
            if ao and ao != "ascending":
                # the coalesce-side direction refund assumed the
                # ascending default; re-derive the walk's direction
                # from the shipped covers and move the ±0.01 to the
                # configured geocoder_address_order (verifymatch.js:
                # 748,933 — same arithmetic as the fused path)
                direction = None
                lastmask = -1
                lastlayer = None
                ign = self.index.ignore_order_layers
                il = getattr(self.index, "idx_layer", {})
                for k2, (m2, ix2) in enumerate(zip(
                        d["cover_masks"][ri], d["cover_idxs"][ri])):
                    l2 = il.get(int(ix2), "")
                    ignore2 = l2 in ign or (lastlayer is not None
                                            and lastlayer in ign)
                    if k2 > 0 and direction is None and not ignore2:
                        direction = ("ascending" if lastmask < m2
                                     else "descending")
                    lastmask, lastlayer = m2, l2
                if direction == ao:
                    relevance += 0.01
                elif direction == "ascending":
                    relevance -= 0.01
            # query-wide tmpid → {masks} strict map (same structure the
            # fused path builds from cand_stacks)
            q_cover_masks: dict = {}
            for t_, m_ in zip(d["qmatch_tmpids"][ri],
                              d["qmatch_masks"][ri]):
                q_cover_masks.setdefault(int(t_), set()).add(int(m_))
            relevance += close_but_no_cigar_adj(
                d["cover_tmpids"][ri], d["cover_idxs"][ri],
                d["cover_zooms"][ri], d["cover_sublens"][ri],
                d["cover_masks"][ri], d["cover_relevs"][ri],
                tmpid, ctx, ctx_strict_masks=q_cover_masks)
            # query-wide strict set over the squishy layers (carmen's
            # strict map spans every spatialmatch — see CAND_SCHEMA
            # qmatch_* comment), filtered by the config's layer sets
            qmatched = {
                int(t) for t, l in zip(d["qmatch_tmpids"][ri],
                                       d["qmatch_layers"][ri])
                if l in self.index.grant_score_layers
                or l in self.index.inherit_score_layers}
            squishy_ctx_target = None
            for c in ctx:
                ctmp = int(c.idx) * TMPID_SHIFT + int(c.fid)
                if ctmp in qmatched \
                        and c.layer in self.index.inherit_score_layers:
                    squishy_ctx_target = str(c.text).lower()
                    break
            if squishy_ctx_target is not None:
                for c in ctx:
                    ctmp = int(c.idx) * TMPID_SHIFT + int(c.fid)
                    if ctmp not in qmatched \
                            and c.layer in self.index.grant_score_layers \
                            and str(c.text).lower() == squishy_ctx_target:
                        relevance += 0.01
                        break
            if addr_state is False:
                # street-fallback penalty, same as the fused path
                # (verifymatch.js:489-492)
                relevance *= 0.99
            relevance = round_to(relevance, 6)

            feat_radius = float(getattr(feature, "proximity_radius", 0.0) or 0.0) or None
            if has_prox and feat_radius:
                scoredist = float(prox.scoredist(
                    float(feature.score), self.index.min_score,
                    self.index.max_score, dist, int(feature.zoom),
                    radius=feat_radius))
            squishy = _squishy_boost(self.index, feature, ctx, qmatched)
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
                address=(matched_address
                         if addr_number and addr_state is not False
                         else "n/a"),
                ghost=ghost)
            if resolved:
                lon, lat = resolved["lon"], resolved["lat"]
            else:
                lon, lat = float(feature.center_lon), float(feature.center_lat)
            rows["query_id"].append(d["query_id"][ri])
            rows["limit"].append(int(d["limit"][ri]))
            rows["si"].append(int(d["si"][ri]))
            rows["tmpid"].append(tmpid)
            if self.index.multitype_active:
                # shifted extids for multityped/aliased features —
                # identical walk to forward_one (staged==fused parity)
                from .engine import _extid, _stack_chain

                fc = _stack_chain(self.index, [feature] + list(ctx))
                rows["feature_id"].append(_extid(self.index, feature, fc[0][1]))
                rows["context"].append([_extid(self.index, f, t)
                                        for f, t in fc[1:]])
            else:
                rows["feature_id"].append(feature.doc_id)
                rows["context"].append([c.doc_id for c in ctx])
            rows["relevance"].append(relevance)
            rows["composite"].append(composite)
            rows["place_name"].append(place_name)
            rows["center_lon"].append(lon)
            rows["center_lat"].append(lat)
            rows["fzoom"].append(int(feature.zoom))
            rows["score"].append(float(feature.score))
            rows["scoredist"].append(float(scoredist))
            rows["idx"].append(int(feature.idx))
            rows["fid"].append(int(feature.fid))
            rows["address"].append(matched_address)
            rows["routable_lon"].append(routable[0] if routable else None)
            rows["routable_lat"].append(routable[1] if routable else None)
            rows["matching_text"].append(matching_text)
            rows["matching_language"].append(matching_language)
            rows["language"].append(matched_lang)
            fbbox = self.index.feature_bbox_am(frow, feature) or (None,) * 4
            rows["bbox_w"].append(fbbox[0])
            rows["bbox_s"].append(fbbox[1])
            rows["bbox_e"].append(fbbox[2])
            rows["bbox_n"].append(fbbox[3])
            rows["st_relev"].append(float(d["st_relev"][ri]))
            rows["partial_number"].append(partial)
            rows["verified_ok"].append(True)
            rows["omitted"].append(
                bool(resolved.get("omitted")) if resolved
                else bool(getattr(feature, "omitted", False)))
            rows["interpolated"].append(
                bool(resolved and resolved.get("line") is not None))
            rows["addr_key"].append(addr_dedupe_key_parts(
                self.index, feature, d["cover_text"][ri],
                d["top_subquery"][ri], ctx))
        # __qshard for the assemble exchange computed in-stage (same
        # fusion rationale as PhrasematchStage)
        return add_qshard(pa.table({name: pa.array(rows[name], type=t)
                                    for name, t in _HYD_FIELDS}))


def assemble_shard(shard_group: pa.Table) -> pa.Table:
    """Final per-query assembly (pure, no index access): best-per-tmpid,
    D2 place-name dedup, D3 ghost-vs-scored dedup, the fused path's
    total-order sort, limit, cell derivation. One shuffle group holds
    many queries (coarse qshard); exact grouping is done inside.
    Arrow in / Arrow out like coalesce_shard. Candidates are handled as
    row indices over bulk-converted column lists — the per-candidate
    30-field dicts this replaces were half the stage's CPU."""
    from .coalesce import ChunkedVerifyPlanner
    from .engine import attach_cells

    rows = {name: [] for name, _ in RESULT_FIELDS}
    if shard_group.num_rows:
        # numerics to plain python lists (cheap C tolist; python-float
        # compares in the sorts), strings/lists stay object arrays —
        # to_pydict on the wide list<string> context column measured 2x
        # slower than this split conversion
        d = {}
        for c in shard_group.column_names:
            col = shard_group.column(c)
            arr = col.to_numpy(zero_copy_only=False)
            if arr.dtype != object:
                arr = arr.tolist()
            d[c] = arr
        qids = shard_group.column("query_id").to_numpy(zero_copy_only=False)
        order = np.argsort(qids, kind="mergesort")
        sorted_qids = qids[order]
        bounds = np.flatnonzero(np.concatenate(
            [[True], sorted_qids[1:] != sorted_qids[:-1]]))
        bounds = np.append(bounds, len(sorted_qids))
        si_l = d["si"]
        st_l = d["st_relev"]
        pnum_l = d["partial_number"]
        ok_l = d["verified_ok"]
        rel_l = d["relevance"]
        comp_l = d["composite"]
        sd_l = d["scoredist"]
        idx_l = d["idx"]
        fid_l = d["fid"]
        tmpid_l = d["tmpid"]
        name_l = d["place_name"]
        score_l = d["score"]
        lim_l = d["limit"]
        om_l = d["omitted"]
        itp_l = d["interpolated"]
        ak_l = d["addr_key"]
        adr_l = d["address"]
        for b in range(len(bounds) - 1):
            sel = order[bounds[b]:bounds[b + 1]].tolist()
            # fused tie order: stacks are visited si-ascending and a
            # later candidate replaces only on strictly greater
            # (relevance, composite) — sort by si to recreate
            # first-stack-wins
            sel.sort(key=lambda i: si_l[i])
            # exchange-invariant guard: the boundary sorts hand each
            # qshard partition to exactly ONE map_batches call (Ray
            # 2.49's sort reduce emits one block per partition, pinned
            # by test_exchange_invariant). If a future Ray splits
            # reduce outputs, a query's candidates straddle two coalesce
            # batches and each fragment restarts si at 0 — duplicated
            # ordinals here are that failure's deterministic signature.
            if len({si_l[i] for i in sel}) != len(sel):
                raise RuntimeError(
                    "duplicate stack ordinals for query "
                    f"{qids[sel[0]]!r}: an upstream exchange partition "
                    "was split across batches (one-block-per-partition "
                    "sort invariant broken — see staged.py exchange "
                    "comments)")
            qid = qids[sel[0]]
            lim = lim_l[sel[0]]
            # replay the fused path's chunked verify (backfill + early
            # stop) against the known outcomes: only candidates the
            # protocol would actually have verified survive; tombstones
            # never do
            kept = set(ChunkedVerifyPlanner(
                [st_l[i] for i in sel],
                [pnum_l[i] for i in sel],
            ).replay([ok_l[i] for i in sel]))
            cand = [i for k, i in enumerate(sel) if k in kept]
            if not cand:
                continue
            best: dict[int, int] = {}
            for i in cand:
                t = tmpid_l[i]
                prev = best.get(t)
                if prev is None or (rel_l[i], comp_l[i]) > (
                        rel_l[prev], comp_l[prev]):
                    best[t] = i

            # D2 place-name + uniqueAddressId dedup with the
            # non-omitted / non-interpolated replacement preference,
            # then D3 ghost-vs-scored — identical walk to the fused
            # dedupe (engine.forward_one)
            results = []
            seen_keys: dict[str, int] = {}
            for i in sorted(best.values(), key=lambda i: (
                    -rel_l[i], -comp_l[i], bool(om_l[i]),
                    -sd_l[i], bool(itp_l[i]), idx_l[i], si_l[i],
                    fid_l[i])):
                keys = [name_l[i]]
                if ak_l[i]:
                    keys.append(ak_l[i])
                prev_i = next(
                    (seen_keys[k] for k in keys if k in seen_keys), None)
                if prev_i is not None:
                    if adr_l[prev_i] and not adr_l[i]:
                        pass  # street fallback never replaces an address
                    elif bool(om_l[prev_i]) and not bool(om_l[i]):
                        results[results.index(prev_i)] = i
                        seen_keys.update({k: i for k, v in seen_keys.items()
                                          if v == prev_i})
                    elif bool(itp_l[prev_i]) and not bool(itp_l[i]):
                        results[results.index(prev_i)] = i
                        seen_keys.update({k: i for k, v in seen_keys.items()
                                          if v == prev_i})
                    continue
                for k in keys:
                    seen_keys[k] = i
                results.append(i)
            # D3 order-dependent ghost filter, identical to the fused path
            scored_texts: set[str] = set()
            deduped = []
            for i in results:
                text = name_l[i].split(",")[0].strip().lower()
                if score_l[i] >= 0 or text not in scored_texts:
                    deduped.append(i)
                    if score_l[i] >= 0:
                        scored_texts.add(text)
            # a dedupe replacement can break the walk order — re-sort
            # like the fused path's final sort
            deduped.sort(key=lambda i: (
                -rel_l[i], -comp_l[i], bool(om_l[i]),
                -sd_l[i], bool(itp_l[i]), idx_l[i], si_l[i], fid_l[i]))
            for rank, i in enumerate(deduped[:lim]):
                out = {
                    "feature_id": d["feature_id"][i],
                    # output clamp AFTER the sort (verifymatch.js:295):
                    # a squishy 1.01 outranks 1.0 but displays as 1
                    "relevance": min(rel_l[i], 1.0),
                    "place_name": name_l[i],
                    "center_lon": d["center_lon"][i],
                    "center_lat": d["center_lat"][i],
                    "zoom": d["fzoom"][i],
                    "context": d["context"][i],
                    "score": score_l[i], "scoredist": sd_l[i],
                    "address": d["address"][i],
                    "routable_lon": d["routable_lon"][i],
                    "routable_lat": d["routable_lat"][i],
                    "matching_text": d["matching_text"][i],
                    "matching_language": d["matching_language"][i],
                    "language": d["language"][i],
                    # NaN (pandas null) -> None so both paths emit nulls
                    **{k: (None if d[k][i] is None or d[k][i] != d[k][i]
                           else float(d[k][i]))
                       for k in ("bbox_w", "bbox_s", "bbox_e", "bbox_n")},
                    "rank": rank,
                }
                attach_cells(out)  # cells only for surviving rows
                rows["query_id"].append(qid)
                for name, _ in RESULT_FIELDS[1:]:
                    rows[name].append(out.get(name))
    return pa.table({name: pa.array(rows[name], type=t) for name, t in RESULT_FIELDS})


def _pool_size(concurrency: int, pools: int) -> tuple[int, int]:
    """Autoscaling (floor, cap) for one of `pools` coexisting actor
    pools under a shared CPU budget — full-size pools per shard
    oversubscribe and thrash (measured 7× parallelism on 32 CPUs);
    floors above per//2 were re-tested in r3 and regressed (pool
    spin-up outweighs the ramp saving)."""
    per = max(1, (concurrency + pools - 1) // pools)
    return (max(1, per // 2), per)


class QueryCheckpoint:
    """Query-path resume at the post-coalesce barrier (VERDICT r4 #8).

    The post-coalesce candidate set is the narrowest intermediate in
    the staged plan and the natural checkpoint: coalesce is per-query
    pure (the kernel groups by query_id internally and holds no
    cross-query state), so the candidate rows for a query-id bucket are
    identical no matter which other queries run alongside it. The
    checkpoint partitions candidates by a fixed hash of query_id
    (`add_qshard`'s bucket mapped to one of ~2·concurrency ranges,
    pinned in ``_ckpt_meta.json`` so a resume at a different
    concurrency keeps the same partition map) through the
    manifest/lineage machinery of ``sources/io.py`` — atomic
    per-partition commits, so a 100 TB batch-geocode job killed at 90%
    re-runs only the query buckets without a committed partition
    instead of restarting from zero. The reference has no query-side
    checkpointing at all (its geocode path is request/response).
    """

    def __init__(self, checkpoint_dir: str, concurrency: int):
        import json as _json
        import os as _os

        from ..sources import io as ckio

        self._io = ckio
        self.dir = checkpoint_dir
        meta_path = _os.path.join(checkpoint_dir, "_ckpt_meta.json")
        if _os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = _json.load(f)
            if meta.get("qshard_mod") != QSHARD_MOD:
                raise ValueError(
                    f"checkpoint {checkpoint_dir} was written with "
                    f"qshard_mod={meta.get('qshard_mod')}; engine has "
                    f"{QSHARD_MOD} — refusing to mix partition maps")
        else:
            _os.makedirs(checkpoint_dir, exist_ok=True)
            meta = {"qshard_mod": QSHARD_MOD,
                    "step": max(1, QSHARD_MOD // max(4, 2 * concurrency)),
                    "engine_version": ckio.ENGINE_VERSION}
            tmp = meta_path + ".tmp"
            with open(tmp, "w") as f:
                _json.dump(meta, f)
            _os.replace(tmp, meta_path)
        self.bounds = np.arange(int(meta["step"]), QSHARD_MOD,
                                int(meta["step"]), dtype=np.int64)
        self.keys = [f"{p:05d}" for p in range(len(self.bounds) + 1)]
        self.done = set(ckio.completed_partitions(checkpoint_dir))
        self.todo = [k for k in self.keys if k not in self.done]

    def _pids(self, t: pa.Table) -> np.ndarray:
        """Partition index per row — the same pandas query_id hash as
        add_qshard (deterministic across processes), bucketed by the
        meta-pinned boundaries."""
        import pandas as pd

        h = pd.util.hash_pandas_object(
            t.column("query_id").to_pandas(), index=False).to_numpy()
        return np.searchsorted(
            self.bounds, (h % QSHARD_MOD).astype(np.int64), side="right")

    def filter_queries(self, queries_ds):
        """Resume half of the contract: drop queries whose candidate
        partition is already committed, so only incomplete buckets
        re-run the phrasematch+coalesce half."""
        todo = np.array(sorted(int(k) for k in self.todo), dtype=np.int64)

        def keep_incomplete(t: pa.Table) -> pa.Table:
            return t.filter(pa.array(np.isin(self._pids(t), todo)))

        return queries_ds.map_batches(keep_incomplete, batch_format="pyarrow")

    def write_cands(self, cands) -> None:
        """Consume the live half-1 plan into committed partitions, then
        mark buckets that produced no candidates complete (zero-row
        partitions) so a resume never re-runs them."""
        keys = self.keys

        def part_key(t: pa.Table, _pids=self._pids) -> pa.Table:
            col = pa.array([keys[p] for p in _pids(t).tolist()],
                           type=pa.string())
            return t.append_column("__part", col)

        self._io.write_dataset_partitioned(
            cands, self.dir, part_key, resume=True, format="parquet")
        empty = pa.table({n: pa.array([], type=CAND_SCHEMA.field(n).type)
                          for n in CAND_SCHEMA.names})
        for k in self._io.remaining_partitions(self.dir, self.keys):
            self._io.write_partition(self.dir, k, empty, format="parquet")
        self.done = set(self._io.completed_partitions(self.dir))
        self.todo = []

    def read_cands(self):
        """Stream the committed candidate partitions back as the
        stage-3 input. read_parquet is a fresh plan root, which also
        supplies the plan-split barrier the non-checkpoint path gets
        from materialize()."""
        import os as _os

        import ray.data as rd

        parts = self._io.completed_partitions(self.dir)
        missing = [k for k in self.keys if k not in parts]
        if missing:
            raise RuntimeError(
                f"checkpoint {self.dir} incomplete after write: "
                f"{len(missing)} partitions missing (e.g. {missing[:3]})")
        paths = [
            _os.path.join(self._io.partition_dir(self.dir, k), "data.parquet")
            for k, rec in sorted(parts.items()) if rec.get("rows", 0) > 0
        ]
        if not paths:
            empty = pa.table({n: pa.array([], type=CAND_SCHEMA.field(n).type)
                              for n in CAND_SCHEMA.names})
            return rd.from_arrow(empty)
        return rd.read_parquet(paths)


def forward_geocode_staged(queries_ds, index=None, concurrency: int = 4,
                           config=None, phrase_shards: int = 1,
                           verify_shards: int = 1,
                           index_dir: str | None = None,
                           checkpoint_dir: str | None = None):
    """The staged pipeline with the explicit per-query shuffles.

    index_dir mode: every actor reads its own shard from the
    partitioned parquet index — the driver ships only the path, shard
    coordinates and config. Table mode (index=CarmenIndex) ships the
    phrase/feature tables through fn_constructor_kwargs for
    compact/test use.

    checkpoint_dir: enable query-path resume (QueryCheckpoint). The
    post-coalesce candidate set is committed to atomic per-bucket
    partitions before the verify half; a killed run re-runs only
    uncommitted buckets. Costs one extra narrow-row shuffle plus the
    disk round-trip, so it's opt-in for long batch jobs."""
    if index_dir is not None:
        pm_base = {"index_dir": index_dir, "config": config}
        vf_base = {"index_dir": index_dir, "config": config}
    else:
        feats = index.features
        if "spans" in feats.column_names:
            feats = feats.drop_columns(["spans"])
        pairs = sorted(set(zip(feats["layer"].to_pylist(),
                               feats["idx"].to_pylist())), key=lambda t: t[1])
        idx_rank = {int(ix): r for r, (_, ix) in enumerate(pairs)}
        layer_bounds = {}
        if feats.num_rows and "bbox_w" in feats.column_names:
            lbdf = feats.select(
                ["layer", "bbox_w", "bbox_s", "bbox_e", "bbox_n"]
            ).to_pandas().groupby("layer").agg(
                {"bbox_w": "min", "bbox_s": "min",
                 "bbox_e": "max", "bbox_n": "max"})
            layer_bounds = {
                l: [float(r.bbox_w), float(r.bbox_s),
                    float(r.bbox_e), float(r.bbox_n)]
                for l, r in lbdf.iterrows()}
        pm_base = {
            "phrase_grid": index.phrase_grid, "freq": index.freq,
            "max_score": index.max_score, "layer_zooms": index.layer_zooms,
            "config": config, "idx_rank": idx_rank,
            "layer_bounds": layer_bounds,
        }
        vf_base = {
            "features": feats, "max_score": index.max_score,
            "layer_zooms": index.layer_zooms, "config": config,
            "idx_rank": idx_rank,
        }

    ckpt = (QueryCheckpoint(checkpoint_dir, concurrency)
            if checkpoint_dir is not None else None)
    nparts = max(4, 2 * concurrency)
    step = max(1, QSHARD_MOD // nparts)
    qbounds = list(range(step, QSHARD_MOD, step))

    if ckpt is not None and not ckpt.todo:
        # fully-committed checkpoint: skip the phrasematch+coalesce
        # half entirely and stream the candidates back from disk
        cands = ckpt.read_cands()
        return _verify_half(cands, vf_base, concurrency, qbounds)
    if ckpt is not None and ckpt.done:
        queries_ds = ckpt.filter_queries(queries_ds)

    # ---- stage 1: phrase-sharded phrasematch fan-out -----------------
    # every query visits every shard's actor pool; each pool holds only
    # its pshard slice of the phrase table (phrase rows are disjoint
    # across shards, so the union has no duplicate phrasematch rows)
    conc = _pool_size(concurrency, max(1, phrase_shards))
    if phrase_shards > 1:
        # a union branch per shard re-executes the shared upstream plan
        # once PER BRANCH (Ray Data unions duplicate lineage, they don't
        # share subplans) — pin the query blocks first so the fan-out
        # reads them instead of recomputing; the query batch is narrow,
        # so the object-store footprint is tiny even at bench scale
        queries_ds = queries_ds.materialize()
    if phrase_shards <= 1:
        pm_rows = queries_ds.map_batches(
            PhrasematchStage, fn_constructor_kwargs=pm_base,
            batch_format="pyarrow", batch_size=256, concurrency=conc,
            num_cpus=0.5,
        )
    else:
        parts = []
        for s in range(phrase_shards):
            kw = dict(pm_base, shard=s, of_n=phrase_shards)
            parts.append(queries_ds.map_batches(
                PhrasematchStage, fn_constructor_kwargs=kw,
                batch_format="pyarrow", batch_size=256, concurrency=conc,
                num_cpus=0.5,
            ))
        pm_rows = parts[0].union(*parts[1:])

    # ---- stage 2: shuffle 1 + per-query coalesce ---------------------
    # __qshard rides on the pm rows from inside PhrasematchStage. The
    # exchange is sort-with-EXPLICIT-boundaries + per-block map_batches
    # rather than groupby().map_groups(): the bucket space is a uniform
    # hash (0..QSHARD_MOD), so boundaries are known a priori — this
    # skips the sort's whole sampling wave (one task per block + a
    # driver barrier, per exchange) and sets the partition count
    # directly (~2 per slot for wave balance) instead of inheriting
    # one-partition-per-input-block. coalesce_shard groups by query_id
    # internally, so partitioning only needs to co-locate each query's
    # rows — which any boundary between bucket values preserves.
    cands = (
        pm_rows.sort("__qshard", boundaries=qbounds)
        .map_batches(coalesce_shard, batch_format="pyarrow", batch_size=None)
    )
    import os as _os

    if ckpt is not None:
        # the checkpoint commit consumes the half-1 plan and the
        # read-back is a fresh plan root — it IS the plan-split barrier
        ckpt.write_cands(cands)
        cands = ckpt.read_cands()
    elif _os.environ.get("GRAFT_PLAN_SPLIT", "1") != "0":
        # plan-split barrier: one streaming plan holding every pool +
        # three all-to-alls thrashes the executor's per-operator
        # resource budgets at small CPU counts (measured 594 s vs 239 s
        # for the same stages run in two halves at 8 CPUs — the r3
        # architecture had this barrier for lineage reasons and removing
        # it regressed 2.5×). The pinned set is the post-coalesce
        # candidate top-k: the smallest intermediate in the pipeline,
        # narrow Arrow rows.
        cands = cands.materialize()

    return _verify_half(cands, vf_base, concurrency, qbounds)


def _verify_half(cands, vf_base, concurrency: int, qbounds: list[int]):
    """Stages 3-4: the verify exchange + hydrate pool and the final
    per-query assembly exchange, over a candidate Dataset in
    CAND_SCHEMA (live from coalesce, or streamed from a
    QueryCheckpoint)."""
    # ---- stage 3: ONE vshard exchange + one hydrate pool -------------
    # a single groupby(vskey) routes every candidate to exactly one
    # group whose rows share a feature shard; the pool's actors read
    # fshard slices lazily (≤ VSHARD_SALT reads per shard across the
    # whole pool). This replaced the r3 per-shard filter-branch fan-out,
    # which re-scanned the full candidate set per branch (×V read
    # amplification) behind a materialize barrier, with V separate
    # actor pools. `verify_shards` only sizes the pool now — shard
    # ownership is per-group, not per-pool.
    vconc = _pool_size(concurrency, 1)
    hydrated = cands.groupby("vskey").map_groups(
        VerifyHydrate, fn_constructor_kwargs=vf_base,
        batch_format="pyarrow", concurrency=vconc, num_cpus=0.5,
    )

    # ---- stage 4: shuffle 3 + per-query assembly (pure) --------------
    # __qshard rides on the hydrated rows from inside VerifyHydrate;
    # same known-boundary exchange as stage 2 (assemble_shard also
    # groups by query_id internally)
    return (
        hydrated.sort("__qshard", boundaries=qbounds)
        .map_batches(assemble_shard, batch_format="pyarrow", batch_size=None)
    )
