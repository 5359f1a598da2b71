"""raster_vector_join's distributed cell-keyed plan must equal the
all-pairs tile-containment reference semantics (coalesce._aligned)."""

from __future__ import annotations

import pandas as pd
import pytest


def test_raster_vector_join_matches_all_pairs(ray_session, tmp_path):
    import ray.data as rd

    from carmen_ray.geocode.coalesce import _aligned
    from carmen_ray.index.build import build_index
    from carmen_ray.pipelines import geo_queries
    from carmen_ray.sources.synth import generate_corpus

    tbl = generate_corpus(n_streets=30, n_pois=20)
    index = build_index(rd.from_arrow(tbl).repartition(2))

    media = index.media_cells.to_pandas()
    pg = index.phrase_grid.to_pandas()[["layer", "zoom", "x", "y", "fid"]].drop_duplicates()
    covers = pg.to_records(index=False)
    rows = []
    for row in media.itertuples():
        z, x, y = (int(v) for v in row.zxy.split("/"))
        for c in covers:
            if _aligned(x, y, z, int(c.x), int(c.y), int(c.zoom)):
                rows.append((row.media_ref, row.doc_id, int(c.fid), str(c.layer)))
    want = set(rows)

    # run the distributed plan against the SAME corpus, streaming-built
    # to parquet (the query's real input mode — nothing driver-resident)
    import carmen_ray.pipelines.flagship as fl
    from carmen_ray.index.build import build_index_streaming

    out = str(tmp_path / "idx")
    build_index_streaming(rd.from_arrow(tbl).repartition(2), out)
    orig = fl.build_corpus_and_index_streaming

    def fl_build(scale, blocks=8, out_dir=None, corpus_mult=1, load=True):
        return tbl, out

    fl.build_corpus_and_index_streaming = fl_build
    try:
        got_df = geo_queries.q_raster_vector_join("/root/testdata/sf0.001").to_pandas()
    finally:
        fl.build_corpus_and_index_streaming = orig
    got = set(map(tuple, got_df.itertuples(index=False)))
    assert got == want
