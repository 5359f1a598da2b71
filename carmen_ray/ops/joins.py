"""Distributed joins as explicit bucketed shuffles.

Ray Data (2.49) has no general two-sided join primitive, so these build
the portable pattern: tag each side, bucket by hash(key) % B, union,
groupby(bucket), pandas merge inside each bucket. One shuffle total,
vectorized inner joins, B controls the per-group size (salt hot keys by
raising B). Used by the query registry and available as engine
operators (SURVEY.md §2.4 J3; as-of join from §"custom operators").

Side/dtype bookkeeping: the union concatenates frames with different
column sets, padding the other side's columns with NaN and upcasting
int→float. To split sides without guessing (the old dropna-based
inference dropped all-null columns and broke left joins on empty
buckets), each non-key column is renamed to `__{l|r}{dtypecode}__{name}`
at tag time — the merge task decodes side AND original dtype from the
name alone, with no driver-side schema fetch (ds.schema() on a
post-shuffle dataset would force execution)."""

from __future__ import annotations

import numpy as np
import pandas as pd

# dtype codes carried in encoded column names; ints/bools become
# nullable pandas extension dtypes on restore so NaN padding from the
# union round-trips to typed nulls instead of silently going float.
_RESTORE = {
    "i8": "Int8", "i16": "Int16", "i32": "Int32", "i64": "Int64",
    "u8": "UInt8", "u16": "UInt16", "u32": "UInt32", "u64": "UInt64",
    "b": "boolean", "x": None,  # x = leave as-is (float/str/datetime survive concat)
}


def _code(dtype) -> str:
    s = str(dtype)
    if s.startswith("int") or s.startswith("Int"):
        return "i" + s.lstrip("intI")
    if s.startswith("uint") or s.startswith("UInt"):
        return "u" + s.lstrip("uintU")
    if s in ("bool", "boolean"):
        return "b"
    return "x"


def _tag_and_bucket(ds, keys: list[str], side: str, buckets: int,
                    hash_keys: list[str] | None = None):
    """Bucket by hash(hash_keys or keys) and rename non-key columns to
    carry side + dtype. Key columns keep their names (shared across
    sides). asof_join passes hash_keys=[by] so one `by` key always
    lands in one bucket while `on` stays name-shared."""
    hash_keys = hash_keys or keys

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[hash_keys[0]], index=False).to_numpy()
        for k in hash_keys[1:]:
            h = h * np.uint64(31) + pd.util.hash_pandas_object(df[k], index=False).to_numpy()
        ren = {c: f"__{side}{_code(df[c].dtype)}__{c}" for c in df.columns if c not in keys}
        df = df.rename(columns=ren)
        df["__side"] = np.int8(0 if side == "l" else 1)
        df["__bucket"] = (h % buckets).astype(np.int32)
        return df

    return ds.map_batches(tag, batch_format="pandas")


def _decode(group: pd.DataFrame, side: str, keys: list[str]) -> pd.DataFrame:
    """Rows of one side with original column names and restored dtypes."""
    want = np.int8(0 if side == "l" else 1)
    rows = group[group["__side"] == want]
    prefix = f"__{side}"
    out = {}
    for k in keys:
        if k in rows.columns:
            out[k] = rows[k]
    for c in rows.columns:
        if c.startswith(prefix) and "__" in c[2:]:
            code, name = c[len(prefix):].split("__", 1)
            target = _RESTORE.get(code)
            col = rows[c]
            if target is not None and str(col.dtype) != target:
                col = col.astype(target)
            out[name] = col
    return pd.DataFrame(out)


def _null_pad(df: pd.DataFrame, other_cols: list[str]) -> pd.DataFrame:
    """Add the other side's columns as typed nulls (left rows with no
    right match when the bucket's right side is entirely empty)."""
    df = df.copy()
    for c in other_cols:
        if c not in df.columns:
            df[c] = pd.Series(pd.NA, index=df.index, dtype="object")
    return df


def _encoded_names(group: pd.DataFrame, side: str) -> list[str]:
    prefix = f"__{side}"
    return [c[len(prefix):].split("__", 1)[1]
            for c in group.columns if c.startswith(prefix) and "__" in c[2:]]


def hash_join(left, right, on: str | list[str], how: str = "inner", buckets: int = 32,
              suffixes: tuple[str, str] = ("", "_r"), left_prep=None):
    """left ⋈ right on key column(s). Both sides shuffle once by
    hash(key) % buckets; the merge inside each bucket is pandas.
    Preserves left rows under how='left' even when a bucket has no
    right rows (and symmetrically for 'right'/'outer').

    `left_prep(df)` runs on the decoded left side of each bucket before
    the merge. Because hash partitioning puts every row of one key in
    one bucket, a per-bucket drop_duplicates here is a GLOBAL distinct —
    lets callers fold a dedupe exchange into the join (minhash LSH)."""
    keys = [on] if isinstance(on, str) else list(on)
    tagged = _tag_and_bucket(left, keys, "l", buckets).union(
        _tag_and_bucket(right, keys, "r", buckets)
    )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        l = _decode(group, "l", keys)
        if left_prep is not None and not l.empty:
            l = left_prep(l)
        r = _decode(group, "r", keys)
        if l.empty and r.empty:
            return pd.DataFrame()
        if r.empty:
            if how in ("inner", "right"):
                return pd.DataFrame()
            return _null_pad(l, _encoded_names(group, "r"))  # left/outer keep left rows
        if l.empty:
            if how in ("inner", "left"):
                return pd.DataFrame()
            return _null_pad(r, _encoded_names(group, "l"))
        return l.merge(r, on=keys, how=how, suffixes=suffixes)

    return tagged.groupby("__bucket").map_groups(merge, batch_format="pandas")


def asof_join(left, right, on: str, by: str, buckets: int = 32,
              direction: str = "backward", tolerance=None):
    """As-of LEFT join (e.g. events ⋈ latest dimension state at event
    time): bucket by the `by` key, sort within bucket, pd.merge_asof per
    bucket. Left rows are always preserved — a bucket whose right side
    is empty emits the left rows with null right columns (the old
    implementation dropped them). Partitioning assumption: all rows of
    one `by` key land in one bucket (hash partitioning guarantees it)."""
    keys = [by, on]
    tagged = _tag_and_bucket(left, keys, "l", buckets, hash_keys=[by]).union(
        _tag_and_bucket(right, keys, "r", buckets, hash_keys=[by])
    )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        l = _decode(group, "l", keys)
        if l.empty:
            return pd.DataFrame()
        r = _decode(group, "r", keys)
        l = l.sort_values(on, kind="mergesort")
        if r.empty:
            return _null_pad(l, _encoded_names(group, "r"))
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


def anti_join_ds(left, right, on: str, buckets: int = 32):
    """Distributed anti join (left rows with no match in right) — the
    scale path for customers_without_events: no driver-side key set,
    one bucketed shuffle like hash_join. Right side only ships its key
    column."""
    keys = [on]
    r_keys = right.map_batches(
        lambda df: df[[on]].drop_duplicates(), batch_format="pandas"
    )
    tagged = _tag_and_bucket(left, keys, "l", buckets).union(
        _tag_and_bucket(r_keys, keys, "r", buckets)
    )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        l = _decode(group, "l", keys)
        if l.empty:
            return pd.DataFrame()
        r = group.loc[group["__side"] == np.int8(1), on]
        return l[~l[on].isin(set(r))]

    return tagged.groupby("__bucket").map_groups(merge, batch_format="pandas")
