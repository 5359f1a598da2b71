"""Map-side combined grouped aggregation.

A bare ds.groupby(k).aggregate(...) shuffles every row AND (in Ray
2.49's sort-based aggregate) pays ~1ms of per-group overhead — 15k
distinct keys cost ~20s regardless of data size. `grouped_aggregate`
instead:

1. combines inside map_batches (vectorized pandas groupby per batch —
   one row per key per batch);
2. shuffles the partials by a coarse shard = hash(key) % num_shards
   (so the shuffle has `num_shards` groups, not |keys| groups);
3. finishes with a vectorized pandas groupby inside each shard.

Exact for sum/count/min/max/mean (mean decomposes to sum+count) at any
key cardinality; the per-group Python tax is O(num_shards). This is the
partial+final pattern every 100 TB aggregation needs (SURVEY.md §2.5).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd


@dataclass
class Spec:
    out: str         # output column name
    col: str | None  # input column (None for count)
    op: str          # sum|count|min|max|mean


def grouped_aggregate(ds, keys: list[str], specs: list[Spec], num_shards: int = 16,
                      partial_blocks: int | None = None):
    """See module docstring. `partial_blocks` kept for API compat.

    The partial (the stage the full data flows through) runs on
    zero-copy Arrow via pa.Table.group_by — no Arrow→pandas conversion
    of the input blocks; only the already-reduced per-batch partials
    (one row per key per batch) touch pandas, for the shard hash. The
    final stage stays pandas: it sees num_shards tiny groups and its
    sorted accumulation order is what keeps float sums reproducible."""
    import pyarrow as pa

    # build the deduplicated arrow aggregation list once; map each
    # arrow output column to the (possibly several) partial names
    agg_list: list[tuple] = []
    out_names: dict[tuple, list[str]] = {}

    def want(col, op, name):
        k = (col, op)
        if k not in out_names:
            out_names[k] = []
            agg_list.append(([] if col is None else col, op))
        out_names[k].append(name)

    for s in specs:
        if s.op == "count":
            want(None, "count_all", f"__{s.out}")
        elif s.op == "mean":
            # denominator = non-null count (SQL AVG ignores NULLs)
            want(s.col, "sum", f"__{s.out}__sum")
            want(s.col, "count", f"__{s.out}__n")
        else:
            want(s.col, s.op, f"__{s.out}")

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({})
        g = t.group_by(keys, use_threads=False).aggregate(agg_list)
        cols = {k: g.column(k) for k in keys}
        for (col, op), names in out_names.items():
            src = g.column(op if col is None else f"{col}_{op}")
            for name in names:
                cols[name] = src
        shard = (
            pd.util.hash_pandas_object(
                g.column(keys[0]).to_pandas(), index=False
            ).to_numpy() % num_shards
        ).astype(np.int32)
        cols["__shard"] = pa.array(shard, type=pa.int32())
        return pa.table(cols)

    def final(group: pd.DataFrame) -> pd.DataFrame:
        # Deterministic accumulation order: partial blocks arrive in
        # nondeterministic order; sorting by key + partial values makes
        # the float sums reproducible across runs and parallelism.
        group = group.sort_values(
            by=[c for c in group.columns if c != "__shard"], kind="mergesort"
        )
        aggs = {}
        for s in specs:
            if s.op in ("sum", "count"):
                aggs[s.out] = (f"__{s.out}", "sum")
            elif s.op in ("min", "max"):
                aggs[s.out] = (f"__{s.out}", s.op)
            elif s.op == "mean":
                aggs[f"{s.out}__sum"] = (f"__{s.out}__sum", "sum")
                aggs[f"{s.out}__n"] = (f"__{s.out}__n", "sum")
        out = group.groupby(keys, as_index=False, sort=False).agg(**aggs)
        for s in specs:
            if s.op == "mean":
                out[s.out] = out[f"{s.out}__sum"] / out[f"{s.out}__n"]
                out = out.drop(columns=[f"{s.out}__sum", f"{s.out}__n"])
        return out

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__shard")
        .map_groups(final, batch_format="pandas")
        .map_batches(lambda df: df.drop(columns=["__shard"], errors="ignore"), batch_format="pandas")
    )
