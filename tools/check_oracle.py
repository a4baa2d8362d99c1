"""Local replica of the driver's correctness gate: run every queries() entry
and compare against oracle_sql() via DuckDB (row count + sorted-column-name
schema + order-insensitive value hash).

Usage: python tools/check_oracle.py [sf_dir]
"""

from __future__ import annotations

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


def main(sf_dir: str) -> int:
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    # build the oracles for THIS sf dir directly (the driver runs at
    # sf0.01; locally we check other scales too) — calling
    # entrymod.oracle_sql() here would generate the sf0.01 corpus/TSV/
    # media artifacts only to discard its return value
    from zeeklog_ray.queries import build_oracle_sql, ensure_oracle_corpus

    ensure_oracle_corpus(sf_dir)
    oracles = build_oracle_sql(sf_dir)
    failures = 0
    for name, fn in qs.items():
        t0 = time.monotonic()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(got)} (rows-only) [{dt:.1f}s]")
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
            print(f"FAIL {name}: {'; '.join(problems)} [{dt:.1f}s]")
            if "value hash mismatch" in problems:
                m = got.merge(exp, how="outer", indicator=True,
                              on=list(sorted(set(got.columns) & set(exp.columns))))
                diff = m[m["_merge"] != "both"]
                print(diff.head(10).to_string())
        else:
            print(f"PASS {name}: rows={len(got)} [{dt:.1f}s]")
    ray.shutdown()
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.exit(1 if main(sf) else 0)
