"""Committed golden oracles (goldens/) stay in sync with the engine:
a fresh flagship run at sf0.01 must reproduce the golden parquet
byte-for-value, and the raster containment theta-join over the golden
inputs must equal the distributed ancestor-key plan's output.
Regenerate intentionally with tools/make_goldens.py."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

GOLDEN = "/root/repo/goldens"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_geocode_join_matches_golden(ray_session):
    from carmen_ray.pipelines.queries import QUERIES

    live = QUERIES["geocode_join"]("/root/testdata/sf0.01").to_pandas()
    gold = duckdb.sql(
        f"SELECT * FROM read_parquet('{GOLDEN}/geocode_join_sf0.01.parquet')").df()
    assert len(live) == len(gold) > 0
    pd.testing.assert_frame_equal(_canon(live), _canon(gold))


def test_raster_join_matches_golden_theta_join(ray_session):
    from carmen_ray.pipelines.geo_queries import GEO_QUERIES, SQL_RASTER_VECTOR

    live = GEO_QUERIES["raster_vector_join"]("/root/testdata/sf0.01").to_pandas()
    gold = duckdb.sql(SQL_RASTER_VECTOR).df()
    assert len(live) == len(gold) > 0
    pd.testing.assert_frame_equal(_canon(live), _canon(gold))
