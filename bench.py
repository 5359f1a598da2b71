"""Benchmark harness — prints ONE JSON line with headline seconds +
per-query timings.

    python bench.py              # full bench over $GRAFT_SF_DIR (default sf0.1)
    python bench.py --scaling    # same pipeline at 8 and 32 CPUs in fresh
                                 # processes → scaling efficiency

Headline metric: the flagship geocode-join (corpus synth → index build →
batched forward/reverse/id geocode) — docs+queries/sec. Individual
operator pipelines from the query registry are timed under "queries".
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "pricing_summary",
    "order_lineitem_join",
    "events_hourly",
    "exact_dedup",
    "minhash_pairs",
    "simhash_pairs",
    "knn_cosine",
    "text_token_counts",
]


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import pyarrow.parquet as pq

    # warm the page cache so we measure compute+shuffle, not first read
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        pq.read_table(f"{SF_DIR}/{t}.parquet")

    from carmen_ray.pipelines.flagship import build_corpus_and_index, corpus_scale_for, make_queries
    from carmen_ray.geocode.engine import forward_geocode_ds
    import ray.data as rd

    # ---- headline: geocode-join -------------------------------------
    t0 = time.time()
    scale = corpus_scale_for(SF_DIR)
    corpus_tbl, index = build_corpus_and_index(scale=scale, blocks=NUM_CPUS)
    build_s = time.time() - t0

    queries = make_queries(index)
    n_queries = queries.num_rows
    t1 = time.time()
    qds = rd.from_arrow(queries).repartition(NUM_CPUS)
    results = forward_geocode_ds(qds, index, concurrency=max(2, NUM_CPUS // 4))
    n_results = results.count()
    geocode_s = time.time() - t1

    headline = build_s + geocode_s
    docs_per_s = corpus_tbl.num_rows / build_s if build_s else 0.0
    queries_per_s = n_queries / geocode_s if geocode_s else 0.0

    # ---- operator pipelines -----------------------------------------
    from carmen_ray.pipelines.queries import QUERIES

    q_times = {}
    for name in BENCH_QUERIES:
        t2 = time.time()
        res = QUERIES[name](SF_DIR)
        if hasattr(res, "count"):
            res.count()
        q_times[name] = round(time.time() - t2, 3)

    out = {
        "metric": "geocode_join_plus_ops_sec",
        "value": round(headline + sum(q_times.values()), 3),
        "unit": "sec",
        "queries": q_times,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "geocode": {
            "index_docs": corpus_tbl.num_rows,
            "index_build_sec": round(build_s, 3),
            "index_docs_per_sec": round(docs_per_s, 1),
            "n_queries": n_queries,
            "geocode_sec": round(geocode_s, 3),
            "queries_per_sec": round(queries_per_s, 1),
            "n_results": n_results,
        },
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = run(lo), run(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8": t_lo,
        "sec_32": t_hi,
        "throughput_8": round(1.0 / t_lo, 4),
        "throughput_32": round(1.0 / t_hi, 4),
        "sf": SF_DIR,
        "detail": {"lo": r_lo, "hi": r_hi},
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
