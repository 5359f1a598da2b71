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

    Numeric note: the partial's float sums MUST be pandas/numpy —
    pyarrow's sum kernel accumulates in a different order and its
    last-ulp drift turns DuckDB-oracle hash matches red (measured on
    events_hourly/customer_nation). The partial therefore takes Arrow
    blocks (zero-copy from the store), prunes to the key+agg columns,
    and converts ONLY those to pandas — the wide payload columns never
    round-trip."""
    import pyarrow as pa

    need: list[str] = list(keys)
    for s in specs:
        if s.col and s.col not in need:
            need.append(s.col)

    def partial(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame()
        df = t.select([c for c in need if c in t.column_names]).to_pandas()
        aggs = {}
        for s in specs:
            if s.op == "count":
                aggs[f"__{s.out}"] = (keys[0], "size")
            elif s.op == "mean":
                # denominator = non-null count (SQL AVG ignores NULLs;
                # pandas sum skips NaN, so size would divide by too many)
                aggs[f"__{s.out}__sum"] = (s.col, "sum")
                aggs[f"__{s.out}__n"] = (s.col, "count")
            else:
                aggs[f"__{s.out}"] = (s.col, s.op)
        out = df.groupby(keys, as_index=False, sort=False).agg(**aggs)
        out["__shard"] = (
            pd.util.hash_pandas_object(out[keys[0]], index=False).to_numpy() % num_shards
        ).astype(np.int32)
        return out

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
