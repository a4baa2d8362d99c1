"""CLI entrypoint — the ``ray job submit`` surface of the engine.

Mirrors the reference's driver (``/root/reference/src/main.rs``) minus the
TUI: the query is (base corpus dir, start/end date, src_ip, source), the
output is routed per-sink Parquet + a per-sink stats report + the distinct
source-address summary (the ``ip.db`` the reference's tests write,
``tests/zeek_search.rs:70-123``).

Usage::

    python -m zeeklog_ray.cli --corpus <dir> --out <dir> \
        [--start-date 2024-07-02] [--end-date 2024-07-04] \
        [--src-ip 43.134.231.178] [--source conn] [--enrich] \
        [--resume] [--files-per-shard 8] [--num-cpus N]

``--resume`` runs through the lineage manifest (skips committed shards);
without it the fused one-pass flagship runs.  The script owns its Ray
session (``__ray_entry__`` and the library never call ray.init).
"""

from __future__ import annotations

import argparse
import json
import sys


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="zeeklog-ray", description=__doc__)
    p.add_argument("--corpus", required=True, help="corpus base dir (date=* partitions)")
    p.add_argument("--out", required=True, help="output dir (sink=* partitions)")
    p.add_argument("--start-date")
    p.add_argument("--end-date")
    p.add_argument("--src-ip")
    p.add_argument("--source")
    p.add_argument("--enrich", action="store_true")
    p.add_argument("--resume", action="store_true",
                   help="sharded run with lineage manifest; re-runs skip committed shards")
    p.add_argument("--files-per-shard", type=int, default=8)
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--ip-db", help="also write the distinct source-address list here")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_argparser().parse_args(argv)

    from zeeklog_ray.compat import expand_path, parse_date, parse_ip

    corpus = expand_path(args.corpus)
    if args.src_ip:
        parse_ip(args.src_ip)
    for d in (args.start_date, args.end_date):
        if d:
            parse_date(d)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from zeeklog_ray.pipeline import PipelineConfig

    cfg = PipelineConfig(corpus_dir=corpus, start_date=args.start_date,
                         end_date=args.end_date, src_ip=args.src_ip,
                         source=args.source, enrich=args.enrich)

    if args.resume:
        from zeeklog_ray.lineage import ResumableRun

        rr = ResumableRun(cfg, args.out, files_per_shard=args.files_per_shard)
        records = rr.run()
        rows = {}
        for rec in records:
            for s, n in rec["rows_per_sink"].items():
                rows[s] = rows.get(s, 0) + n
        report = {"mode": "resume", "new_shards": len(records),
                  "rows_per_sink_new": rows}
    else:
        from zeeklog_ray.flagship import run_flagship

        stats = run_flagship(cfg, args.out)
        report = {"mode": "flagship", "plan": cfg.plan(),
                  "rows_per_sink": dict(zip(stats["sink"], stats["n"].astype(int)))}

    if args.ip_db:
        from zeeklog_ray.aggregate import distinct_column
        from zeeklog_ray.pipeline import build_dataset

        ips = sorted(distinct_column(build_dataset(cfg), "id_orig_h")
                     .to_pandas()["id_orig_h"])
        with open(args.ip_db, "w") as f:
            f.write("\n".join(ips) + "\n")
        report["ip_db"] = {"path": args.ip_db, "n_ips": len(ips)}

    print(json.dumps(report))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
