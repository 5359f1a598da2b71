"""`ray job submit` entrypoint: streaming index build with resumable
checkpoints.

    ray job submit --working-dir . -- \
        python jobs/build_index_job.py --input <docs parquet dir> \
            --out /data/index --scale 6

On a cluster this script is the driver: it owns the Ray session
(`ray.init()` with no address connects to the cluster from inside
`ray job submit`), streams the corpus through the index pipelines, and
writes partitioned parquet + lineage so a pre-empted job resumes by
skipping committed partitions. Locally it runs against
`address="local"`.
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
    ap.add_argument("--input", default=None, help="parquet dir of (doc_id, spans); default: synthesize")
    ap.add_argument("--out", required=True)
    ap.add_argument("--scale", type=int, default=1)
    ap.add_argument("--num-cpus", type=int, default=None, help="local mode only")
    ap.add_argument("--streaming", action="store_true", default=True)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        if args.num_cpus:
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, logging_level="ERROR")
        else:  # inside `ray job submit` this attaches to the cluster
            ray.init(logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from carmen_ray.index.build import build_index_streaming
    from carmen_ray.sources.io import read_docs
    from carmen_ray.sources.synth import generate_corpus_ds

    t0 = time.time()
    if args.input:
        # prune to the input_hint contract at the read — the build never
        # touches any other column
        docs = read_docs(args.input, columns=["doc_id", "spans"])
    else:
        docs = generate_corpus_ds(scale=args.scale)
    n = docs.count()
    build_index_streaming(docs, args.out)
    print(json.dumps({
        "docs": n,
        "out": args.out,
        "wall_s": round(time.time() - t0, 2),
        "docs_per_s": round(n / (time.time() - t0), 1),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
