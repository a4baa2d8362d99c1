"""Scale-bench input generators: determinism, schema, planted dups."""

import duckdb

from zeeklog_ray.benchdata import bench_docs_parquet, bench_events_parquet


def test_bench_events_schema_and_determinism():
    p1 = bench_events_parquet(2_000, 50, seed=5)
    p2 = bench_events_parquet(2_000, 50, seed=5)      # cached → same path
    assert p1 == p2
    n, users, nulls = duckdb.sql(
        f"SELECT COUNT(*), COUNT(DISTINCT user_id), "
        f"SUM(CASE WHEN ts IS NULL OR value IS NULL THEN 1 ELSE 0 END) "
        f"FROM '{p1}/*.parquet'").fetchone()
    assert n == 2_000 and 0 < users <= 50 and nulls == 0


def test_bench_docs_planted_dups():
    p = bench_docs_parquet(3_000, dup_rate=0.2, seed=9)
    n, distinct = duckdb.sql(
        f"SELECT COUNT(*), COUNT(DISTINCT text) FROM '{p}/*.parquet'").fetchone()
    assert n == 3_000
    dup_frac = 1 - distinct / n
    assert 0.1 < dup_frac < 0.3          # ~dup_rate of docs copy a source
