"""`ray job submit` entrypoint: batch geocode a query table against a
built index.

    ray job submit --working-dir . -- \
        python jobs/geocode_job.py --index /data/index \
            --queries /data/queries.parquet --out /data/results
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True, help="dir from build_index_job / Geocoder.save")
    ap.add_argument("--queries", default=None, help="parquet of query rows; default: derived mix")
    ap.add_argument("--out", required=True)
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--num-cpus", type=int, default=None, help="local mode only")
    ap.add_argument("--staged", action="store_true",
                    help="staged sharded pipeline (the scale path; "
                         "reverse/id queries still route to the fused pool)")
    ap.add_argument("--checkpoint", default=None,
                    help="checkpoint dir for query-path resume: a killed "
                         "run re-runs only uncommitted query buckets "
                         "(implies --staged)")
    ap.add_argument("--phrase-shards", type=int, default=2)
    args = ap.parse_args()
    if args.checkpoint:
        args.staged = True

    import ray

    if not ray.is_initialized():
        if args.num_cpus:
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, logging_level="ERROR")
        else:
            ray.init(logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from carmen_ray.geocode.engine import forward_geocode_ds

    # staged mode is index_dir-driven (actors self-load their shards);
    # the driver only loads the index when the fused path or the
    # derived query mix needs it
    index = None
    if not args.staged or not args.queries:
        from carmen_ray.index.build import load_index_streaming

        index = load_index_streaming(args.index)
    if args.queries:
        # prune to the query-row contract at the read (all optional
        # columns the engine consumes; anything else never leaves disk)
        import pyarrow.dataset as pds

        known = ["query_id", "query", "proximity_lon", "proximity_lat",
                 "limit", "types", "language", "worldview"]
        present = set(pds.dataset(args.queries, format="parquet").schema.names)
        qds = rd.read_parquet(
            args.queries, columns=[c for c in known if c in present])
        n = qds.count()
    else:
        from carmen_ray.pipelines.flagship import make_queries

        q = make_queries(index)
        n = q.num_rows
        qds = rd.from_arrow(q).repartition(max(2, args.concurrency) * 2)
        if "kind" in q.column_names:
            qds = qds.drop_columns(["kind"])

    t0 = time.time()
    if args.staged:
        import pyarrow as pa

        from carmen_ray.geocode.staged import forward_geocode_staged
        from carmen_ray.text.tokenize import as_reverse, parse_id_query

        def _kind_filter(forward: bool):
            def fn(t: pa.Table) -> pa.Table:
                qs = t.column("query").to_pylist()
                keep = [
                    (as_reverse(s) is None and parse_id_query(s) is None) == forward
                    for s in qs]
                return t.filter(pa.array(keep))

            return fn

        fwd = qds.map_batches(_kind_filter(True), batch_format="pyarrow")
        results = forward_geocode_staged(
            fwd, concurrency=args.concurrency,
            phrase_shards=args.phrase_shards, index_dir=args.index,
            checkpoint_dir=args.checkpoint)
        # reverse/id leg: ~4× cheaper per query, fused lean pool (the
        # queries table is narrow, so the extra classify pass is cheap)
        other = qds.map_batches(_kind_filter(False), batch_format="pyarrow")
        if other.count():
            results = results.union(forward_geocode_ds(
                other, concurrency=max(2, args.concurrency // 4),
                index_dir=args.index, reverse_only=True))
    else:
        results = forward_geocode_ds(qds, index, concurrency=args.concurrency)
    results.write_parquet(args.out)
    wall = time.time() - t0
    print(json.dumps({
        "queries": n,
        "out": args.out,
        "wall_s": round(wall, 2),
        "queries_per_s": round(n / wall, 1),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
