"""Benchmark harness — one JSON line on stdout (driver contract).

Default: run the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and print::

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, ...}

``--scaling``: run this same script in two FRESH processes at num_cpus=8 and
num_cpus=32 on identical input and report both throughputs plus scaling
efficiency = (t_8 / t_32) / (32/8)  (sandbox stand-in for N vs 4N nodes —
BASELINE.md).
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

# Queries timed beyond the flagship (a representative slice of the registry).
BENCH_QUERIES = [
    "zeek_sink_stats",
    "zeek_distinct_orig_h",
    "lineitem_pricing",
    "events_hourly",
    "order_priority_items",
    "exact_dedup_docs",
    "similarity_topk",
]


def _sf_tag(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir)).removeprefix("sf")


def run_bench() -> dict:
    import ray

    from zeeklog_ray.corpus import corpus_for_sf_dir

    # Corpus generation + page-cache warmup happen OUTSIDE the timed region.
    corpus = corpus_for_sf_dir(SF_DIR)

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from zeeklog_ray.aggregate import grouped_stats
    from zeeklog_ray.pipeline import PipelineConfig, build_dataset, route_to_sinks
    from zeeklog_ray import queries as Q

    # untimed warm read (page cache + Ray worker start)
    build_dataset(PipelineConfig(corpus_dir=corpus)).count()

    # ---- headline: full parse → enrich → route(write) → aggregate ----
    out_dir = f"/tmp/zeeklog_bench/routed-{NUM_CPUS}"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.monotonic()
    ds = build_dataset(PipelineConfig(corpus_dir=corpus, enrich=True))
    route_to_sinks(ds, out_dir)
    stats = grouped_stats(ray.data.read_parquet(out_dir), key="sink").to_pandas()
    headline = time.monotonic() - t0
    n_seq = int(stats["n"].sum())
    n_tok = int(stats["sum_n_tok"].sum())

    timings: dict[str, float] = {"flagship_parse_enrich_route_aggregate": round(headline, 3)}
    for name in BENCH_QUERIES:
        fn = Q.QUERIES[name]
        t0 = time.monotonic()
        res = fn(SF_DIR)
        if hasattr(res, "to_pandas"):
            res.to_pandas()
        timings[name] = round(time.monotonic() - t0, 3)

    ray.shutdown()
    return {
        "metric": "flagship parse→enrich→route→aggregate wall time",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_tag(SF_DIR),
        "num_cpus": NUM_CPUS,
        "sequences": n_seq,
        "tokens": n_tok,
        "seq_per_s": round(n_seq / headline, 1),
        "tok_per_s": round(n_tok / headline, 1),
    }


def run_scaling(lo: int = 8, hi: int = 32) -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                             capture_output=True, text=True, check=True,
                             cwd=os.path.dirname(os.path.abspath(__file__))).stdout
        return json.loads(out.strip().splitlines()[-1])

    r_lo, r_hi = run(lo), run(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling efficiency (fresh processes, same input)",
        "unit": "ratio",
        "num_cpus_lo": lo, "num_cpus_hi": hi,
        "sec_lo": t_lo, "sec_hi": t_hi,
        "seq_per_s_lo": r_lo["seq_per_s"], "seq_per_s_hi": r_hi["seq_per_s"],
        "tok_per_s_lo": r_lo["tok_per_s"], "tok_per_s_hi": r_hi["tok_per_s"],
        "scaling_efficiency": round(eff, 3),
        "sf": r_lo["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
