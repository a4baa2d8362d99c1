"""Local replica of the driver's correctness gate: run every queries() entry
and compare against oracle_sql() via DuckDB (row count + sorted-column-name
schema + order-insensitive value hash).

Usage: python tools/check_oracle.py [sf_dir] [--cpus N] [--md OUT.md]

With --md, appends a per-query markdown section for the certification
artifact (VERDICT r3 item 1: the full-registry proof the driver's ~50-query
sample never covers in one round).
"""

from __future__ import annotations

import argparse
import hashlib
import sys
import time

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    # normalize dtypes: everything to string rows, sorted for order-insensitivity
    rows = sorted(df.astype(str).itertuples(index=False, name=None))
    h = hashlib.sha256(repr(rows).encode())
    return h.hexdigest()[:16]


def main(sf_dir: str, num_cpus: int = 8, md_path: str | None = None,
         only: list[str] | None = None) -> int:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    con = duckdb.connect()
    # cap DuckDB's memory and give it a spill dir: its default limit is
    # 80% of RAM, which collides with Ray's object store in the same
    # process group — the heaviest replay SQL (zeek_packed_rows at
    # sf0.1: a 34M-row token explode + per-pack ordered lists) then dies
    # with a bad-allocation OOM instead of spilling
    con.sql("SET memory_limit='32GB'")
    con.sql("SET temp_directory='/tmp/duckdb_oracle_spill'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    if only:
        missing = [n for n in only if n not in qs]
        if missing:
            raise SystemExit(f"--only names not in registry: {missing}")
        qs = {n: qs[n] for n in only}
    # build the oracles for THIS sf dir directly (the driver runs at
    # sf0.01; locally we check other scales too) — calling
    # entrymod.oracle_sql() here would generate the sf0.01 corpus/TSV/
    # media artifacts only to discard its return value
    from zeeklog_ray.queries import build_oracle_sql, ensure_oracle_corpus

    ensure_oracle_corpus(sf_dir)
    oracles = build_oracle_sql(sf_dir)
    failures = 0
    records: list[tuple[str, str, str, float]] = []  # name, status, rows, sec
    for name, fn in qs.items():
        t0 = time.monotonic()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}",
                  flush=True)
            failures += 1
            records.append((name, "FAIL (raised)", "-",
                            time.monotonic() - t0))
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(got)} (rows-only) [{dt:.1f}s]",
                  flush=True)
            records.append((name, "rows-only", str(len(got)), dt))
            continue
        exp = con.sql(oracles[name]).df()
        problems = []
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} != {len(exp)}")
        if sorted(got.columns) != sorted(exp.columns):
            problems.append(f"schema {sorted(got.columns)} != {sorted(exp.columns)}")
        elif value_hash(got) != value_hash(exp):
            problems.append("value hash mismatch")
        if problems:
            failures += 1
            print(f"FAIL {name}: {'; '.join(problems)} [{dt:.1f}s]", flush=True)
            records.append((name, "FAIL", str(len(got)), dt))
            if "value hash mismatch" in problems:
                m = got.merge(exp, how="outer", indicator=True,
                              on=list(sorted(set(got.columns) & set(exp.columns))))
                diff = m[m["_merge"] != "both"]
                print(diff.head(10).to_string())
        else:
            print(f"PASS {name}: rows={len(got)} [{dt:.1f}s]", flush=True)
            records.append((name, "PASS", str(len(got)), dt))
    ray.shutdown()

    if md_path:
        n_pass = sum(1 for r in records if r[1] == "PASS")
        n_rows_only = sum(1 for r in records if r[1] == "rows-only")
        n_fail = failures
        total_s = sum(r[3] for r in records)
        with open(md_path, "a") as f:
            f.write(f"\n## {sf_dir} — {len(records)} queries: "
                    f"{n_pass} PASS (DuckDB rows+schema+hash), "
                    f"{n_rows_only} rows-only, {n_fail} FAIL "
                    f"({total_s:.0f} s total at num_cpus={num_cpus})\n\n")
            f.write("| query | status | rows | sec |\n|---|---|---|---|\n")
            for name, status, rows, dt in records:
                f.write(f"| {name} | {status} | {rows} | {dt:.1f} |\n")
    return failures


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--md", default=None,
                    help="append a certification markdown section here")
    ap.add_argument("--only", default=None,
                    help="comma-separated query names (incremental re-check)")
    a = ap.parse_args()
    only = a.only.split(",") if a.only else None
    sys.exit(1 if main(a.sf_dir, num_cpus=a.cpus, md_path=a.md, only=only)
             else 0)
