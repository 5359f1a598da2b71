"""Benchmark harness — prints ONE JSON line with headline seconds +
per-query timings.

    python bench.py              # full bench over $GRAFT_SF_DIR (default sf0.1)
    python bench.py --scaling    # headline pipeline at 8 and 32 CPUs in
                                 # fresh processes → scaling efficiency

Headline metric (`value`): the geocode-join — a fixed batch of forward /
proximity / reverse / id queries through the STAGED sharded pipeline
(streaming-built index, phrase-sharded phrasematch pools, explicit
groupby(query_id) shuffle, verify actors) over a 10× interleaved corpus;
reverse/id route through the fused pool. The fused broadcast-index
variant runs on the same corpus and is reported as `fused_*` for
comparison. The query batch is identical at every parallelism level;
pools size with the CPU budget, so this measures throughput scaling of
the same job on the same input. Index build time and the
operator-registry pipelines are reported alongside but not folded into
the scaling headline.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_QUERIES = int(os.environ.get("GRAFT_BENCH_QUERIES", "120000"))
# headline corpus = 10× the sf mapping: the staged scale path must be
# exercised on a corpus the fused broadcast design starts to strain at
CORPUS_MULT = int(os.environ.get("GRAFT_CORPUS_MULT", "10"))
PHRASE_SHARDS = int(os.environ.get("GRAFT_PHRASE_SHARDS", "2"))
VERIFY_SHARDS = int(os.environ.get("GRAFT_VERIFY_SHARDS", "2"))

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


def run_bench(include_ops: bool = True) -> dict:
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

    from carmen_ray.pipelines.flagship import (
        build_corpus_and_index_streaming,
        corpus_scale_for,
        flagship_staged,
        make_queries_from_dir,
    )
    from carmen_ray.geocode.engine import forward_geocode_ds
    import ray.data as rd

    # ---- streaming index build (reported, not the scaling headline) --
    # load=False: the index lands as partitioned parquet and the driver
    # keeps only the path — actors read their own shards
    t0 = time.time()
    scale = corpus_scale_for(SF_DIR)
    corpus_tbl, index_dir = build_corpus_and_index_streaming(
        scale=scale, blocks=NUM_CPUS, corpus_mult=CORPUS_MULT, load=False)
    build_s = time.time() - t0

    # ---- headline: staged geocode-join over a fixed query batch ------
    # staged sharded pipeline (forward) + fused pool (reverse/id): the
    # architecture that still runs when no actor can hold the index.
    # The query batch is built OUTSIDE the timer — a real caller arrives
    # with queries; deriving the synthetic batch is harness setup
    pool = max(2, NUM_CPUS - 2)
    query_tbl = make_queries_from_dir(index_dir, N_QUERIES)
    t1 = time.time()
    results = flagship_staged(
        None, concurrency=pool,
        phrase_shards=PHRASE_SHARDS, verify_shards=VERIFY_SHARDS,
        index_dir=index_dir, queries=query_tbl)
    n_results = results.count()
    geocode_s = time.time() - t1
    queries_per_s = N_QUERIES / geocode_s if geocode_s else 0.0

    # ---- fused comparison (broadcast-index pool, same corpus) --------
    # skipped in scaling legs: only the staged headline feeds the
    # efficiency ratio, and the extra leg doubles wall time
    if os.environ.get("GRAFT_SKIP_FUSED") == "1":
        n_fused, fused_s = None, 0.0
    else:
        t_f = time.time()
        queries = make_queries_from_dir(index_dir, N_QUERIES)
        qds = rd.from_arrow(queries.drop_columns(["kind"])).repartition(pool * 2)
        n_fused = forward_geocode_ds(
            qds, index_dir=index_dir, concurrency=pool, batch_size=128).count()
        fused_s = time.time() - t_f

    out = {
        "metric": "geocode_join_sec",
        "value": round(geocode_s, 3),
        "unit": "sec",
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "queries": {},
        "geocode": {
            "index_docs": corpus_tbl.num_rows,
            "corpus_mult": CORPUS_MULT,
            "phrase_shards": PHRASE_SHARDS,
            "verify_shards": VERIFY_SHARDS,
            "index_build_sec": round(build_s, 3),
            "index_docs_per_sec": round(corpus_tbl.num_rows / build_s, 1) if build_s else 0,
            "n_queries": N_QUERIES,
            "geocode_sec": round(geocode_s, 3),
            "queries_per_sec": round(queries_per_s, 1),
            "n_results": n_results,
            "fused_sec": round(fused_s, 3),
            "fused_queries_per_sec": round(N_QUERIES / fused_s, 1) if fused_s else 0,
            "fused_n_results": n_fused,
        },
    }

    # ---- operator pipelines (latency micro-bench, reported only) -----
    if include_ops:
        from carmen_ray.pipelines.queries import QUERIES

        q_times = {}
        for name in BENCH_QUERIES:
            t2 = time.time()
            res = QUERIES[name](SF_DIR)
            if hasattr(res, "count"):
                res.count()
            q_times[name] = round(time.time() - t2, 3)
        out["queries"] = q_times
        out["ops_total_sec"] = round(sum(q_times.values()), 3)

    ray.shutdown()
    return out


def run_scaling() -> dict:
    """Scaling legs run a 4× query batch (480k default): the north rule
    is a THROUGHPUT-scaling criterion for the 10^12-doc regime, where a
    job runs hours — the measurement must be throughput-bound, not
    dominated by the fixed per-run constant (pool spin-up, three
    exchange barriers ≈ 20-25 s) that a 52-second 32-CPU leg would be.
    The per-120k timings are still reported by the plain bench; both
    batch sizes are recorded in BASELINE.md."""
    scaling_queries = os.environ.get(
        "GRAFT_SCALING_QUERIES", str(4 * N_QUERIES))

    def physical_core_pins(n: int) -> str:
        """CPU list covering n distinct PHYSICAL cores (one logical CPU
        per core). `0..n-1` assumes SMT siblings are enumerated in the
        upper logical range; hosts with interleaved numbering (cpu0/1 =
        one core) would otherwise pin the small leg to n/2 cores and
        inflate the scaling ratio. Falls back to 0..n-1 when sysfs is
        unreadable."""
        import glob

        firsts = []
        try:
            for p in glob.glob(
                    "/sys/devices/system/cpu/cpu[0-9]*/topology/"
                    "thread_siblings_list"):
                cpu = int(p.split("cpu")[-1].split("/")[0])
                sib = open(p).read().strip()
                lead = sib.replace("-", ",").split(",")[0]
                if cpu == int(lead):
                    firsts.append(cpu)
        except (OSError, ValueError):
            firsts = []
        if len(firsts) < n:
            return f"0-{n - 1}"
        return ",".join(str(c) for c in sorted(firsts)[:n])

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SKIP_OPS="1",
                   GRAFT_SKIP_FUSED="1",
                   GRAFT_BENCH_QUERIES=scaling_queries)
        cmd = [sys.executable, os.path.abspath(__file__)]
        # pin each leg to ncpu PHYSICAL cores: ray.init(num_cpus=8) only
        # caps logical task slots — fractional-CPU actors still land on
        # all 32 host cores, making the small leg faster than a real
        # 8-core node and understating the N→4N ratio (measured 642 vs
        # 556 q/s unpinned/pinned at 8). An N-node cluster has N nodes'
        # cores; the pinned leg is the honest sandbox proxy.
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", physical_core_pins(ncpu)] + cmd
        out = subprocess.run(
            cmd, env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = run(lo), run(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    qps_lo = r_lo["geocode"]["queries_per_sec"]
    qps_hi = r_hi["geocode"]["queries_per_sec"]
    eff = (qps_hi / qps_lo) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus": [lo, hi],
        "sec_8": t_lo,
        "sec_32": t_hi,
        "queries_per_sec_8": qps_lo,
        "queries_per_sec_32": qps_hi,
        "sf": SF_DIR,
        "detail": {"lo": r_lo, "hi": r_hi},
    }


def run_skew_leg() -> dict:
    """One skew leg: staged forward geocode of a whale-name query batch
    over a pre-built skew index (GRAFT_SKEW_INDEX_DIR), with
    GRAFT_PM_PRUNE as set by the orchestrator. Prints wall time,
    result count and a content hash for the parity check."""
    import hashlib

    import pyarrow as pa
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from carmen_ray.pipelines.flagship import flagship_staged
    from carmen_ray.sources.synth import _STREET_SUFFIX, _name, _pick

    index_dir = os.environ["GRAFT_SKEW_INDEX_DIR"]
    n_names = int(os.environ.get("GRAFT_SKEW_NAMES", "12"))
    nq = int(os.environ.get("GRAFT_SKEW_QUERIES", "24000"))
    names = [f"{_name(42, 9, k)} {_pick(_STREET_SUFFIX, 42, 9, k, 5)}"
             for k in range(n_names)]
    qids, qs, plon, plat = [], [], [], []
    for i in range(nq):
        qids.append(f"s{i}")
        qs.append(names[i % n_names])
        # half the batch proximity-biased at in-world points: the prune
        # must reproduce the scoredist ordering, not just raw score
        if i % 2:
            plon.append(-155.0 + float(i * 7919 % 290))
            plat.append(-55.0 + float(i * 104729 % 105))
        else:
            plon.append(None)
            plat.append(None)
    qtbl = pa.table({
        "query_id": qids, "query": qs,
        "proximity_lon": pa.array(plon, type=pa.float64()),
        "proximity_lat": pa.array(plat, type=pa.float64()),
        "kind": pa.array(["forward"] * nq),
    })
    pool = max(2, NUM_CPUS - 2)
    t0 = time.time()
    res = flagship_staged(
        None, concurrency=pool, phrase_shards=PHRASE_SHARDS,
        verify_shards=VERIFY_SHARDS, index_dir=index_dir, queries=qtbl)
    df = res.to_pandas()
    wall = time.time() - t0
    df = (df[["query_id", "rank", "feature_id", "relevance", "matching_text"]]
          .sort_values(["query_id", "rank", "feature_id"])
          .reset_index(drop=True))
    digest = hashlib.sha256(df.to_csv(index=False).encode()).hexdigest()
    ray.shutdown()
    return {
        "prune": os.environ.get("GRAFT_PM_PRUNE", "0"),
        "wall_s": round(wall, 3),
        "queries_per_sec": round(nq / wall, 1) if wall else 0,
        "n_queries": nq,
        "n_results": int(len(df)),
        "hash": digest,
    }


def run_skew() -> dict:
    """VERDICT r4 #6 — whale-phrase skew stress: the reference's own
    phrasematch bench regime (2,000 features per name,
    reference bench/phrasematch.js:27). Builds a Zipf-skewed corpus,
    then runs the identical whale-heavy query batch with
    GRAFT_PM_PRUNE off and on in fresh processes (the prune flag is
    read inside actors, so each leg needs its own Ray session) and
    reports both timings plus bit-parity of the ranked output."""
    import tempfile

    import ray

    n_names = int(os.environ.get("GRAFT_SKEW_NAMES", "12"))
    feats = int(os.environ.get("GRAFT_SKEW_FEATS", "2000"))
    idx_dir = tempfile.mkdtemp(prefix="carmen_skew_idx_", dir="/tmp")

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from carmen_ray.index.build import build_index_streaming
    from carmen_ray.sources.synth import generate_skew_corpus

    t0 = time.time()
    tbl = generate_skew_corpus(n_names=n_names, feats_per_name=feats)
    build_index_streaming(rd.from_arrow(tbl).repartition(NUM_CPUS), idx_dir)
    build_s = time.time() - t0
    ray.shutdown()

    def leg(prune: str) -> dict:
        env = dict(os.environ, GRAFT_SKEW_INDEX_DIR=idx_dir,
                   GRAFT_PM_PRUNE=prune, RAY_GRAFT_CPUS=str(NUM_CPUS))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--skew-leg"],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    off, on = leg("0"), leg("1")
    return {
        "metric": "skew_prune_speedup",
        "value": round(off["wall_s"] / on["wall_s"], 3) if on["wall_s"] else 0,
        "unit": "ratio",
        "num_cpus": NUM_CPUS,
        "n_docs": tbl.num_rows,
        "n_names": n_names,
        "feats_per_name": feats,
        "index_build_sec": round(build_s, 3),
        "prune_off": off,
        "prune_on": on,
        "parity": bool(off["hash"] == on["hash"]
                       and off["n_results"] == on["n_results"]),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--skew" in sys.argv:
        print(json.dumps(run_skew()))
    elif "--skew-leg" in sys.argv:
        print(json.dumps(run_skew_leg()))
    else:
        print(json.dumps(run_bench(include_ops=os.environ.get("GRAFT_SKIP_OPS") != "1")))
