"""Faithful-mode helpers + CLI end-to-end."""

import json
import subprocess
import sys

import pandas as pd
import pytest

from zeeklog_ray.compat import (
    date_range,
    expand_path,
    faithful_cell_scan,
    parse_date,
    parse_ip,
    prune_empty,
)
from zeeklog_ray.corpus import GOLDEN_IP_0702_ONLY
from zeeklog_ray.pipeline import PipelineConfig, build_dataset


def test_faithful_cell_scan_golden_parity(corpus_dir):
    """Mirror of tests/zeek_search.rs:189-216 at the cell level: the golden
    IP yields non-empty per-field match counts on 2024-07-02 and an empty
    structure on 2024-07-03."""
    present = faithful_cell_scan(
        build_dataset(PipelineConfig(corpus_dir=corpus_dir,
                                     start_date="2024-07-02")),
        GOLDEN_IP_0702_ONLY)
    absent = faithful_cell_scan(
        build_dataset(PipelineConfig(corpus_dir=corpus_dir,
                                     start_date="2024-07-03")),
        GOLDEN_IP_0702_ONLY)
    assert len(present) > 0 and len(absent) == 0
    # cells live only in address fields
    assert set(present["field"]) <= {"id_orig_h", "id_resp_h"}


def test_prune_empty():
    df = pd.DataFrame({"a": [1, None], "b": [None, None], "c": ["x", None]})
    out = prune_empty(df)
    assert list(out.columns) == ["a", "c"]
    assert len(out) == 1


def test_path_and_input_parsers():
    import os

    assert expand_path("~/x").startswith(os.environ.get("HOME", "/"))
    assert parse_ip("10.0.0.1") == "10.0.0.1"
    with pytest.raises(ValueError):
        parse_ip("999.1.2.3")
    assert parse_date("2024-07-02").day == 2
    with pytest.raises(ValueError):
        parse_date("07/02/2024")
    assert date_range("2024-07-02", "2024-07-04") == [
        "2024-07-02", "2024-07-03", "2024-07-04"]
    with pytest.raises(ValueError):
        date_range("2024-07-04", "2024-07-02")


def test_cli_end_to_end(corpus_dir, tmp_path):
    """Run the CLI as a subprocess (its own Ray session) — the ray-job
    surface."""
    out = tmp_path / "routed"
    ipdb = tmp_path / "ip.db"
    res = subprocess.run(
        [sys.executable, "-m", "zeeklog_ray.cli", "--corpus", corpus_dir,
         "--out", str(out), "--enrich", "--num-cpus", "4",
         "--ip-db", str(ipdb)],
        capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    report = json.loads(res.stdout.strip().splitlines()[-1])
    assert report["mode"] == "flagship"
    assert report["rows_per_sink"]["conn"] > 0
    assert report["ip_db"]["n_ips"] == 32
    assert len(ipdb.read_text().strip().splitlines()) == 32
    assert (out / "sink=conn").exists()


def test_cli_zeek_tsv_resume(tmp_path):
    """--input-format zeek-tsv --resume: sharded manifest run over a raw
    log tree; second invocation is a no-op (everything committed)."""
    from zeeklog_ray.zeektsv import write_zeek_log_gz

    tree = str(tmp_path / "zeek")
    line = "\t".join(["1719878400.5", "Cx", "1.2.3.4", "5", "9.8.7.6",
                      "443", "tcp", "ssl", "1", "9"])
    for date in ("2024-07-02", "2024-07-03"):
        write_zeek_log_gz(
            str(tmp_path / "zeek" / date / "conn.00:00:00-23:59:59.log.gz"),
            "conn", [line, line])
    out = str(tmp_path / "routed")
    cmd = [sys.executable, "-m", "zeeklog_ray.cli", "--corpus", tree,
           "--input-format", "zeek-tsv", "--resume", "--files-per-shard",
           "1", "--out", out, "--num-cpus", "4"]
    res = subprocess.run(cmd, capture_output=True, text=True,
                         cwd="/root/repo", timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    rep = json.loads(res.stdout.strip().splitlines()[-1])
    assert rep["mode"] == "resume" and rep["new_shards"] == 2
    assert rep["rows_per_sink_new"] == {"conn": 4}
    res2 = subprocess.run(cmd, capture_output=True, text=True,
                          cwd="/root/repo", timeout=300)
    rep2 = json.loads(res2.stdout.strip().splitlines()[-1])
    assert rep2["new_shards"] == 0               # fully committed → no-op


def test_cli_lookup_ip_hit_and_miss():
    """Direct-IP mode (reference E3, main.rs:250-268): no --corpus/--out,
    no log scan — hit renders the 12-field record, miss an empty one."""
    from zeeklog_ray.corpus import IP_POOL
    from zeeklog_ray.enrich import GEO_FIELDS, build_geo_dict

    geo = build_geo_dict()
    hit, miss = sorted(geo)[0], IP_POOL[3]      # every 4th pool IP is a miss
    for ip, found in ((hit, True), (miss, False)):
        res = subprocess.run(
            [sys.executable, "-m", "zeeklog_ray.cli", "--lookup-ip", ip],
            capture_output=True, text=True, cwd="/root/repo", timeout=120)
        assert res.returncode == 0, res.stderr[-2000:]
        report = json.loads(res.stdout.strip().splitlines()[-1])
        assert report["mode"] == "lookup-ip" and report["found"] is found
        if found:
            assert report["record"] == geo[hit]
            assert sorted(report["record"]) == sorted(GEO_FIELDS)
        else:
            assert report["record"] == {}


def test_cli_lookup_ip_rejects_bad_ip():
    res = subprocess.run(
        [sys.executable, "-m", "zeeklog_ray.cli", "--lookup-ip", "nope"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120)
    assert res.returncode != 0


def test_cli_requires_corpus_without_lookup(tmp_path):
    res = subprocess.run(
        [sys.executable, "-m", "zeeklog_ray.cli", "--out", str(tmp_path / "o")],
        capture_output=True, text=True, cwd="/root/repo", timeout=120)
    assert res.returncode != 0
    assert "--corpus" in res.stderr


def test_cli_invalid_ip(tmp_path, corpus_dir):
    res = subprocess.run(
        [sys.executable, "-m", "zeeklog_ray.cli", "--corpus", corpus_dir,
         "--out", str(tmp_path / "o"), "--src-ip", "not-an-ip"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120)
    assert res.returncode != 0


def test_cli_dump_schemas_and_list_queries():
    """--dump-schemas / --list-queries are metadata-only: no Ray session,
    instant, and consistent with the in-process registries."""
    from zeeklog_ray.queries import QUERIES
    from zeeklog_ray.sources import sink_schemas

    res = subprocess.run(
        [sys.executable, "-m", "zeeklog_ray.cli", "--dump-schemas", "--enrich"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120)
    assert res.returncode == 0, res.stderr[-2000:]
    assert json.loads(res.stdout) == sink_schemas(enrich=True)

    res = subprocess.run(
        [sys.executable, "-m", "zeeklog_ray.cli", "--list-queries"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120)
    assert res.returncode == 0, res.stderr[-2000:]
    assert res.stdout.split() == sorted(QUERIES)


def test_cli_run_query(tmp_path):
    """--run-query executes a registry query over --sf-dir: JSON lines to
    stdout, or Parquet via --query-out; unknown names fail fast."""
    import pandas as pd

    base = [sys.executable, "-m", "zeeklog_ray.cli",
            "--run-query", "distinct_event_types",
            "--sf-dir", "/root/testdata/sf0.001", "--num-cpus", "4"]
    res = subprocess.run(base, capture_output=True, text=True,
                         cwd="/root/repo", timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    rows = [json.loads(l) for l in res.stdout.strip().splitlines()]
    assert rows and all("event_type" in r for r in rows)

    out = str(tmp_path / "q.parquet")
    res2 = subprocess.run(base + ["--query-out", out], capture_output=True,
                          text=True, cwd="/root/repo", timeout=300)
    assert res2.returncode == 0, res2.stderr[-2000:]
    rep = json.loads(res2.stdout.strip().splitlines()[-1])
    assert rep["rows"] == len(rows)
    back = pd.read_parquet(out)
    assert len(back) == len(rows)

    bad = subprocess.run(
        [sys.executable, "-m", "zeeklog_ray.cli", "--run-query", "nope"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120)
    assert bad.returncode != 0 and "unknown query" in bad.stderr
