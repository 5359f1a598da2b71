"""Distributed joins as explicit bucketed shuffles.

Ray Data (2.49) has no general two-sided join primitive, so these build
the portable pattern: tag each side, bucket by hash(key) % B, union,
groupby(bucket), pandas merge inside each bucket. One shuffle total,
vectorized inner joins, B controls the per-group size (salt hot keys by
raising B). Used by the query registry and available as engine
operators (SURVEY.md §2.4 J3; as-of join from §"custom operators").
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _tag_and_bucket(ds, on: str, side: int, buckets: int):
    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__side"] = np.int8(side)
        df["__bucket"] = (
            pd.util.hash_pandas_object(df[on], index=False).to_numpy() % buckets
        ).astype(np.int32)
        return df

    return ds.map_batches(tag, batch_format="pandas")


def hash_join(left, right, on: str, how: str = "inner", buckets: int = 32,
              suffixes: tuple[str, str] = ("", "_r")):
    """left ⋈ right on one key column. Both sides shuffle once by
    hash(key) % buckets; the merge inside each bucket is pandas."""
    tagged = _tag_and_bucket(left, on, 0, buckets).union(
        _tag_and_bucket(right, on, 1, buckets)
    )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group["__side"] == 0].drop(columns=["__side", "__bucket"])
        r = group[group["__side"] == 1].drop(columns=["__side", "__bucket"])
        l = l.dropna(axis=1, how="all")
        r = r.dropna(axis=1, how="all")
        if l.empty or (r.empty and how == "inner"):
            return pd.DataFrame()
        return l.merge(r, on=on, how=how, suffixes=suffixes)

    return tagged.groupby("__bucket").map_groups(merge, batch_format="pandas")


def asof_join(left, right, on: str, by: str, buckets: int = 32,
              direction: str = "backward", tolerance=None):
    """As-of join (e.g. events ⋈ latest dimension state at event time):
    bucket by the `by` key, sort within bucket, pd.merge_asof per bucket.
    Partitioning assumption: all rows of one `by` key land in one bucket
    (hash partitioning guarantees it)."""
    tagged = _tag_and_bucket(left, by, 0, buckets).union(
        _tag_and_bucket(right, by, 1, buckets)
    )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group["__side"] == 0].drop(columns=["__side", "__bucket"]).dropna(axis=1, how="all")
        r = group[group["__side"] == 1].drop(columns=["__side", "__bucket"]).dropna(axis=1, how="all")
        if l.empty or r.empty:
            return pd.DataFrame()
        l = l.sort_values(on, kind="mergesort")
        r = r.sort_values(on, kind="mergesort")
        kwargs = {"tolerance": tolerance} if tolerance is not None else {}
        return pd.merge_asof(l, r, on=on, by=by, direction=direction, **kwargs)

    return tagged.groupby("__bucket").map_groups(merge, batch_format="pandas")


def semi_join(left, right_keys, on: str):
    """Semi join with a broadcast key set (anti: invert the mask).
    right_keys: a Python set / frozenset shipped to tasks once."""
    keys = frozenset(right_keys)

    def filt(df: pd.DataFrame) -> pd.DataFrame:
        return df[df[on].isin(keys)]

    return left.map_batches(filt, batch_format="pandas")


def anti_join(left, right_keys, on: str):
    keys = frozenset(right_keys)

    def filt(df: pd.DataFrame) -> pd.DataFrame:
        return df[~df[on].isin(keys)]

    return left.map_batches(filt, batch_format="pandas")
