"""Stack-and-coalesce: the spatial join at the heart of forward geocoding.

The reference's implementation lives in Rust (@mapbox/carmen-core,
outside the repo); semantics re-derived from
/root/reference/docs/how-carmen-works.md:151-199, the JS glue
(lib/geocoder/spatialmatch.js:21-136) and the acceptance tests, per
SURVEY.md §7.5:

- a stack combines phrasematches from different indexes whose query
  bitmasks don't overlap and whose grid cells coincide when scaled to a
  common zoom (tile containment across zooms);
- stack relev = Σ grid_relev·subquery_weight, then `rebalance`
  re-weighting (spatialmatch.js:98-136, bit-exact incl. roundTo(…,8));
- an index-hierarchy gap costs 0.01 (how-carmen-works.md:199-212);
- one result per tmpid per direction (ascending/descending/single —
  spatialmatch.js:53-80);
- sort by (relev, scoredist, idx, address, idxAverage)
  (spatialmatch.js:235-241), clamp to SPATIALMATCH_STACK_LIMIT.

Pure-Python per query; the Ray stage wraps batches of queries (fused
actor) or per-query groups (staged shuffle path).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from math import floor as _math_floor

from .. import constants
from ..util.jsmath import round_to


@dataclass(slots=True)
class Grid:
    x: int
    y: int
    relev: float      # phrase relev bucket 0.4-1.0
    score: float      # decoded feature score
    fid: int
    tmpid: int        # idx * 2^25 + fid
    distance: float = 0.0
    scoredist: float = 0.0
    phash: int = 0    # source text hash (carmen:source_phrase_hash)


@dataclass(slots=True)
class Phrasematch:
    idx: int
    layer: str
    zoom: int
    mask: int
    weight: float
    subquery: str
    phrase_id: int
    prefix: bool
    grids: list[Grid]
    address: str | None = None
    partial_number: bool = False
    edit_distance: int = 0    # fuzzy window correction distance (R1)
    cat_match: bool = False   # geocoder_categories hit (phrasematch.js:348-353)


@dataclass(slots=True)
class StackEntry:
    pm: Phrasematch
    grid: Grid
    relev: float  # mutable copy of grid.relev (rebalance rewrites it)

    @property
    def mask(self) -> int:
        return self.pm.mask

    @property
    def idx(self) -> int:
        return self.pm.idx


@dataclass(slots=True)
class Stack:
    entries: list[StackEntry] = field(default_factory=list)
    relev: float = 0.0
    mask: int = 0
    # spatialmatch relev WITH the hierarchy-gap penalty (carmen-core's
    # gappy): drives candidate ORDERING and the chunk protocol's
    # early-stop tier, but never the final relevance — the verify walk
    # rebuilds that from the covers (verifymatch.js:899-933; the
    # strictloose acceptance pins final relevance 1.0 for a
    # country+place stack that skips the region)
    penalized: float = 0.0
    # finest-zoom tile among entries (containment fast path): aligned
    # entries form a nested chain, so a new grid is aligned with every
    # entry iff it is aligned with the finest one
    fzx: int = 0
    fzy: int = 0
    fzz: int = -1

    def covers(self) -> list[StackEntry]:
        """Finest index first (the result feature is covers[0])."""
        e = self.entries
        if len(e) < 2:
            return e
        if len(e) == 2:
            a, b = e
            if (-a.pm.idx, a.pm.mask) <= (-b.pm.idx, b.pm.mask):
                return [a, b]
            return [b, a]
        return sorted(e, key=lambda e: (-e.pm.idx, e.pm.mask))

    def covers_typed(self) -> list[StackEntry]:
        """Query-typed order (lowest mask bit first) — the order carmen's
        Rust coalesce returns entries in; drives direction dedup."""
        e = self.entries
        if len(e) < 2:
            return e
        if len(e) == 2:
            a, b = e
            am, bm = a.pm.mask, b.pm.mask
            if (am & -am, a.pm.idx) <= (bm & -bm, b.pm.idx):
                return [a, b]
            return [b, a]
        return sorted(e, key=lambda e: (e.pm.mask & -e.pm.mask, e.pm.idx))


def _aligned(ax: int, ay: int, az: int, bx: int, by: int, bz: int) -> bool:
    """Tile containment: equal when both scaled to the coarser zoom."""
    if az == bz:
        return ax == bx and ay == by
    if az > bz:
        return (ax >> (az - bz)) == bx and (ay >> (az - bz)) == by
    return ax == (bx >> (bz - az)) and ay == (by >> (bz - az))


MAX_GRIDS_PER_PM = 64     # stacking considers the top grids per phrasematch
_MAX_PARTIALS = constants.STACKABLE_LIMIT * 8
# DFS visit budget: bounds enumeration WORK now that _MAX_PARTIALS
# counts distinct feature chains instead of cell variants (whale
# phrases can visit many aligned cells per kept chain)
_MAX_VISITS = 50000


def non_overlap_from_bits(stack_bits: dict[int, int]) -> dict[int, frozenset[int]]:
    """idx → set of idx partners whose geocoder_stacks are provably
    disjoint (the reference's non_overlapping_indexes mask,
    index.js:325-342). `stack_bits[idx]` is a bitset over the global
    stack-name registry; 0 = no geocoder_stack configured = overlaps
    with everything (never pruned). Symmetric by construction."""
    out: dict[int, frozenset[int]] = {}
    items = [(i, b) for i, b in stack_bits.items() if b]
    for i, bi in items:
        s = frozenset(j for j, bj in items if j != i and not (bi & bj))
        if s:
            out[i] = s
    return out


def stack_and_coalesce(
    phrasematches: list[Phrasematch],
    query_len: int,
    max_stacks: int = constants.SPATIALMATCH_STACK_LIMIT,
    idx_rank: dict | None = None,
    non_overlap: dict[int, frozenset[int]] | None = None,
) -> list[Stack]:
    """Enumerate consistent stacks with caps, rebalance, dedup, sort.

    Hot-phrase guardrails (carmen-core truncates similarly): per
    phrasematch only the best MAX_GRIDS_PER_PM grids (by relev, then
    scoredist) enter the combinatorial stacking; coarser-zoom grids are
    bucketed by cell so extensions probe a dict instead of scanning
    every grid (the zoom-scaled containment join)."""
    if not phrasematches:
        return []
    pms = sorted(phrasematches, key=lambda p: (p.idx, p.mask))

    # prune + pre-bucket grids per pm. The cap bounds DISTINCT FEATURES
    # (whale phrases hold thousands of tmpids), never cells of a kept
    # feature: a >cap-cover polygon (a country at its native zoom) must
    # keep every cell or the containment probe below loses exactly the
    # cell that aligns with a finer stack partner (carmen-core stacks
    # over all grids; the cap is this engine's guardrail).
    pm_grids: dict[int, list[Grid]] = {}
    for i, pm in enumerate(pms):
        grids = pm.grids
        if len(grids) > MAX_GRIDS_PER_PM:
            order = sorted(grids, key=lambda g: (-g.relev, -g.scoredist, g.tmpid))
            kept: set = set()
            for g in order:
                if len(kept) >= MAX_GRIDS_PER_PM:
                    break
                kept.add(g.tmpid)
            grids = [g for g in order if g.tmpid in kept]
        pm_grids[i] = grids

    # partials keyed by (mask, tmpid chain): carmen-core's coalesce
    # keeps ONE context per feature chain (the best cell variant by
    # relev, then the finest cover's scoredist) no matter how many
    # cells a polygon feature covers. Enumerating a Stack per CELL and
    # capping the flat list starved high-idx pms behind big polygons —
    # a z6 region + two z12 polygon layers burned the whole budget on
    # cell variants before the address pm was ever visited
    # (geocode-unit.near-alignment). The cap now bounds DISTINCT
    # chains; a separate visit budget bounds DFS work on whale corpora.
    partials: dict = {}
    visits = [0]
    n_pms = len(pms)

    def _keep(ns: Stack) -> None:
        # per-entry masks in the key: two mask-ASSIGNMENT variants of
        # the same feature chain ('new york new york' asc/desc) are
        # distinct stacks with different direction semantics
        key = (ns.mask,
               tuple((e.pm.mask, e.grid.tmpid) for e in ns.entries))
        prev = partials.get(key)
        if prev is None:
            partials[key] = ns
        elif (ns.relev, ns.entries[-1].grid.scoredist) > (
                prev.relev, prev.entries[-1].grid.scoredist):
            # chains build idx-ascending, so entries[-1] IS covers()[0]
            partials[key] = ns

    def try_extend(base: Stack, start_i: int) -> None:
        base_entries = base.entries
        base_mask = base.mask
        base_relev = base.relev
        fzx, fzy, fzz = base.fzx, base.fzy, base.fzz
        last_idx = base_entries[-1].pm.idx if base_entries else -1
        for i in range(start_i, n_pms):
            if len(partials) >= _MAX_PARTIALS or visits[0] >= _MAX_VISITS:
                return
            pm = pms[i]
            pmask = pm.mask
            if base_mask & pmask:
                continue
            if base_entries and pm.idx <= last_idx:
                continue
            # non_overlapping_indexes pruning (index.js:325-342, passed
            # per-phrasematch at phrasematch.js:382): never enumerate a
            # stack mixing indexes whose geocoder_stacks don't intersect
            if non_overlap and base_entries:
                no = non_overlap.get(pm.idx)
                if no and any(e.pm.idx in no for e in base_entries):
                    continue
            pz = pm.zoom
            w = pm.weight
            for grid in pm_grids[i]:
                if base_entries:
                    # single containment probe vs the finest-zoom entry:
                    # pairwise-aligned tiles nest, so alignment with the
                    # finest entry implies alignment with every entry
                    gx, gy = grid.x, grid.y
                    if pz == fzz:
                        if gx != fzx or gy != fzy:
                            continue
                    elif pz > fzz:
                        d = pz - fzz
                        if (gx >> d) != fzx or (gy >> d) != fzy:
                            continue
                    else:
                        d = fzz - pz
                        if gx != (fzx >> d) or gy != (fzy >> d):
                            continue
                # entry relev = grid relev × subquery weight, the form
                # carmen-core emits (pinned by spatialmatch.rebalance.test.js)
                gr = grid.relev * w
                ns = Stack(
                    entries=base_entries + [StackEntry(pm, grid, gr)],
                    mask=base_mask | pmask,
                    relev=base_relev + gr,
                )
                if pz >= fzz:
                    ns.fzx, ns.fzy, ns.fzz = grid.x, grid.y, pz
                else:
                    ns.fzx, ns.fzy, ns.fzz = fzx, fzy, fzz
                _keep(ns)
                visits[0] += 1
                if len(partials) >= _MAX_PARTIALS or visits[0] >= _MAX_VISITS:
                    return
                try_extend(ns, i + 1)

    try_extend(Stack(), 0)
    partials = list(partials.values())

    # STACKABLE_LIMIT pre-scoring cap (constants.js:20-21): only the best
    # raw-relev partials proceed to rebalance — hot duplicate names can
    # produce hundreds of single-cover partials per query otherwise
    if len(partials) > constants.STACKABLE_LIMIT:
        partials.sort(key=lambda s: (
            -s.relev, -s.entries[0].grid.scoredist, s.entries[0].grid.tmpid))
        kept = partials[: constants.STACKABLE_LIMIT]
        # distinct-feature rescue: carmen-core's coalesce scans EVERY
        # grid and keeps the best context per tmpid, so a polygon
        # feature with many covered cells can never crowd a distinct
        # feature out entirely (geocode-unit.proximity-polygon). The
        # cap here truncates per-grid partials, so re-admit the best
        # partial of each unrepresented top-cover tmpid, bounded by the
        # reference's verify load budget.
        seen_t = {s.covers()[0].grid.tmpid for s in kept}
        extra: list[Stack] = []
        for s in partials[constants.STACKABLE_LIMIT:]:
            if len(extra) >= constants.VERIFYMATCH_MAX_FEATURES_LIMIT:
                break
            t = s.covers()[0].grid.tmpid
            if t not in seen_t:
                seen_t.add(t)
                extra.append(s)
        partials = kept + extra

    # keep only maximal-quality stacks: rebalance + gap penalty. The gap
    # is measured over the DENSE rank of layers present in this index
    # (carmen's ndx — a corpus with no postcode layer has no
    # place→street gap), not the global layer numbering.
    out: list[Stack] = []
    for st in partials:
        rebalanced = rebalance(st, query_len)
        rebalanced.penalized = rebalanced.relev
        if len(rebalanced.entries) > 1:
            if idx_rank:
                idxs = sorted(idx_rank.get(e.pm.idx, e.pm.idx)
                              for e in rebalanced.entries)
            else:
                idxs = sorted(e.pm.idx for e in rebalanced.entries)
            if any(b - a > 1 for a, b in zip(idxs, idxs[1:])):
                rebalanced.penalized = round_to(rebalanced.relev - 0.01, 8)
        out.append(rebalanced)

    out.sort(key=_stack_sort_key)

    # direction dedup (spatialmatch.js:53-80): one per tmpid per typed
    # direction — covers in QUERY order ("address place region" =
    # descending hierarchy typed first vs "region place address")
    done_asc: set[int] = set()
    done_desc: set[int] = set()
    done_single: set[int] = set()
    filtered: list[Stack] = []
    for st in out:
        covers = st.covers_typed()
        tmpid = covers[0].grid.tmpid
        if len(covers) > 1 and covers[0].pm.idx > covers[1].pm.idx:
            if tmpid not in done_desc:
                done_desc.add(tmpid)
                filtered.append(st)
        elif len(covers) > 1:
            if tmpid not in done_asc:
                done_asc.add(tmpid)
                filtered.append(st)
        else:
            if tmpid not in done_asc and tmpid not in done_desc and tmpid not in done_single:
                done_single.add(tmpid)
                filtered.append(st)
        if len(filtered) >= max_stacks:
            break
    return filtered


def _stack_sort_key(st: Stack):
    covers = st.covers()
    top = covers[0]
    entries = st.entries
    has_address = any(e.pm.address for e in entries)
    idx_avg = sum(e.pm.idx for e in entries) / len(entries)
    return (
        -st.penalized,
        -top.grid.scoredist,
        top.pm.idx,
        0 if has_address else 1,
        -idx_avg,
        top.grid.fid,
    )


def rebalance(stack: Stack, query_len: int) -> Stack:
    """Bit-exact port of spatialmatch.js:98-136."""
    floor = _math_floor  # JS Math.round = floor(x + 0.5); roundTo(x, 8)
    stack_mask = 0
    for e in stack.entries:
        stack_mask |= e.pm.mask
    coverage = stack_mask.bit_count()
    missing = query_len - coverage
    n = len(stack.entries)

    stack_weight = 1.0 / n
    if missing > 0:
        stack_weight = 1.0 / (n + 1)

    clone = Stack(mask=stack_mask)
    entries = clone.entries
    total_weight = 0.0
    expected_weight = 0.0
    for e in stack.entries:
        expected_weight += e.relev
        entry_weight = e.pm.mask.bit_count() / query_len
        discount = e.relev / entry_weight if entry_weight else 0.0
        new_relev = floor((e.relev + 1.25 * stack_weight * discount) / 2.25 * 1e8 + 0.5) / 1e8
        entries.append(StackEntry(e.pm, e.grid, new_relev))
        total_weight += new_relev

    penalty = expected_weight - stack.relev
    clone.relev = min(floor((total_weight - penalty) * 1e8 + 0.5) / 1e8, 1.0)
    return clone


class ChunkedVerifyPlanner:
    """The verifymatch chunk/backfill/early-stop protocol
    (verifymatch.js:85-227), as a deterministic state machine over a
    fixed candidate ledger (stacks sorted by relev/scoredist).

    Chunks of up to `batch` candidates are verified; candidates that
    fail (feature missing, filtered, address prefix miss) free slots
    that later chunks backfill, until `stack_limit` verified, the
    VERIFYMATCH_MAX_FEATURES_LIMIT load cap, or the early stop — once
    anything has verified, a backfill chunk never starts below the first
    verified candidate's spatialmatch relev. Partial-number candidates
    are capped at 80% of the stack limit per chunk and deferred, not
    dropped (verifymatch.js:186-212).

    Used interactively by the fused path (verify lazily, feed outcomes
    via `record`) and as a replay by the staged assemble stage (verify
    outcomes already known) — both walk identical candidate sequences,
    which is what keeps the two paths bit-identical.
    """

    def __init__(self, relevs, partials, stack_limit: int | None = None,
                 max_feats: int | None = None):
        self.relevs = list(relevs)
        self.partials = list(partials)
        self.stack_limit = stack_limit or constants.VERIFYMATCH_STACK_LIMIT
        self.max_feats = max_feats or constants.VERIFYMATCH_MAX_FEATURES_LIMIT
        self.partial_cap = 0.8 * self.stack_limit
        self.queue = list(range(len(self.relevs)))
        self.batch = self.stack_limit
        self.seen = 0               # candidates whose verify was attempted
        self.n_verified = 0
        self.first_verified_relev: float | None = None
        self.done = False
        self._build_chunk()

    def _build_chunk(self) -> None:
        queue = self.queue
        chunk: list[int] = []
        backfill: list[int] = []
        stop_early = False
        if len(queue) > self.batch:
            pcount = 0
            for j, i in enumerate(queue):
                if (self.first_verified_relev is not None
                        and self.relevs[i] < self.first_verified_relev):
                    stop_early = True
                    break
                if self.partials[i]:
                    # bug-compat: the reference checks `>` BEFORE
                    # incrementing, so the cap admits cap+2 entries
                    if pcount > self.partial_cap:
                        backfill.append(i)
                        continue
                    pcount += 1
                chunk.append(i)
                if len(chunk) == self.batch:
                    backfill.extend(queue[j + 1:])
                    break
        else:
            # small queues skip the partial cap AND the early stop,
            # exactly like getSpatialmatchesChunk's else branch
            chunk = list(queue)
        self.chunk = chunk
        self.chunk_pos = 0
        self.backfill = backfill
        self.stop_early = stop_early
        if not chunk:
            self.done = True

    def next_candidate(self) -> int | None:
        """Ledger index of the next candidate to verify, or None."""
        if self.done or self.chunk_pos >= len(self.chunk):
            return None
        return self.chunk[self.chunk_pos]

    def record(self, ok: bool) -> None:
        """Feed the verify outcome of the candidate last returned."""
        i = self.chunk[self.chunk_pos]
        self.chunk_pos += 1
        self.seen += 1
        if ok:
            if self.first_verified_relev is None:
                self.first_verified_relev = self.relevs[i]
            self.n_verified += 1
        if self.chunk_pos == len(self.chunk):
            if (self.stop_early or not self.backfill
                    or self.n_verified >= self.stack_limit
                    or self.seen >= self.max_feats):
                self.done = True
                return
            self.queue = self.backfill
            self.batch = min(self.stack_limit - self.n_verified,
                             self.max_feats - self.seen)
            self._build_chunk()

    def replay(self, ok_flags) -> list[int]:
        """Run the whole protocol against known outcomes; returns the
        ledger indices that verified ok, in verification order."""
        kept: list[int] = []
        while True:
            i = self.next_candidate()
            if i is None:
                break
            self.record(bool(ok_flags[i]))
            if ok_flags[i]:
                kept.append(i)
        return kept
