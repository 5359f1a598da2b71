"""Bucketed join correctness: left-row preservation on empty buckets,
dtype round-trips through the union's NaN padding, anti join.

Reference semantics: plain SQL joins (the oracle queries run these same
operators against DuckDB at sf0.01 via tools/check_oracle.py)."""

from __future__ import annotations

import pandas as pd
import pytest

from carmen_ray.ops.joins import anti_join_ds, asof_join, hash_join


def _ds(df):
    import ray.data as rd

    return rd.from_pandas(df)


@pytest.fixture()
def frames():
    left = pd.DataFrame({
        "k": [1, 2, 3, 4, 5, 6, 7, 8],
        "lv": [10, 20, 30, 40, 50, 60, 70, 80],
        "ls": list("abcdefgh"),
    })
    right = pd.DataFrame({"k": [2, 4, 6], "rv": [200, 400, 600]})
    return left, right


def test_left_join_preserves_unmatched(ray_session, frames):
    left, right = frames
    out = hash_join(_ds(left), _ds(right), on="k", how="left", buckets=8).to_pandas()
    assert len(out) == 8  # every left row survives, even in buckets with no right rows
    out = out.sort_values("k").reset_index(drop=True)
    assert out.loc[out["k"] == 2, "rv"].iloc[0] == 200
    assert pd.isna(out.loc[out["k"] == 1, "rv"]).all()
    # int columns restored (not float-upcast by the union padding)
    assert str(out["lv"].dtype) in ("Int64", "int64")


def test_inner_join_matches_pandas(ray_session, frames):
    left, right = frames
    out = hash_join(_ds(left), _ds(right), on="k", how="inner", buckets=8).to_pandas()
    ref = left.merge(right, on="k", how="inner")
    assert sorted(out["k"]) == sorted(ref["k"])
    assert len(out) == 3


def test_outer_join_both_sides(ray_session, frames):
    left, right = frames
    right2 = pd.concat([right, pd.DataFrame({"k": [99], "rv": [9900]})])
    out = hash_join(_ds(left), _ds(right2), on="k", how="outer", buckets=8).to_pandas()
    assert len(out) == 9
    assert 99 in set(out["k"])


def test_asof_left_preserves_rows_with_empty_right_bucket(ray_session):
    left = pd.DataFrame({
        "uid": [1, 1, 2, 3, 3, 3],
        "ts": [5, 15, 7, 1, 9, 20],
        "ev": [100, 101, 200, 300, 301, 302],
    })
    # uid 2 and 3 have no right-side rows at all
    right = pd.DataFrame({"uid": [1, 1], "ts": [0, 10], "state": [7, 8]})
    out = asof_join(_ds(left), _ds(right), on="ts", by="uid", buckets=8).to_pandas()
    assert len(out) == 6  # ASOF LEFT: every event kept
    ref = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"), on="ts", by="uid"
    )
    got = out.sort_values(["uid", "ts"]).reset_index(drop=True)
    want = ref.sort_values(["uid", "ts"]).reset_index(drop=True)
    assert list(got["ev"]) == list(want["ev"])
    assert got["state"].astype("float").fillna(-1).tolist() == \
        want["state"].astype("float").fillna(-1).tolist()


def test_asof_same_by_key_single_bucket(ray_session):
    """All rows of one `by` key must co-locate: correctness depends on
    bucketing by `by` alone, not (by, ts)."""
    left = pd.DataFrame({"uid": [7] * 50, "ts": list(range(50)), "ev": list(range(50))})
    right = pd.DataFrame({"uid": [7] * 5, "ts": [0, 10, 20, 30, 40], "state": [0, 1, 2, 3, 4]})
    out = asof_join(_ds(left), _ds(right), on="ts", by="uid", buckets=16).to_pandas()
    got = out.sort_values("ts")["state"].tolist()
    want = pd.merge_asof(left, right, on="ts", by="uid")["state"].tolist()
    assert got == want


def test_anti_join_ds(ray_session, frames):
    left, right = frames
    out = anti_join_ds(_ds(left), _ds(right), on="k", buckets=8).to_pandas()
    assert sorted(out["k"]) == [1, 3, 5, 7, 8]
