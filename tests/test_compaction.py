"""Partition compaction: content preservation, idempotence, journal
roll-forward crash recovery (zeeklog_ray/partitioned.py)."""
import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _read_all(root):
    import ray.data

    return ray.data.read_parquet(root).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)


def _n_files(d):
    return len([f for f in os.listdir(d) if f.endswith(".parquet")])


@pytest.fixture
def small_file_table(ray_session, tmp_path):
    import ray.data

    from zeeklog_ray.partitioned import write_partitioned

    df = pd.DataFrame({
        "event_id": range(600),
        "day": [f"2024-06-{1 + i % 3:02d}" for i in range(600)],
        "value": [i * 7 % 101 for i in range(600)],
    })
    root = str(tmp_path / "t")
    # 12 blocks -> several small files per partition
    write_partitioned(ray.data.from_pandas(df).repartition(12),
                      root, ["day"])
    return root, df


def test_compact_preserves_content_and_reduces_files(small_file_table):
    from zeeklog_ray.partitioned import compact_partitions

    root, df = small_file_table
    before = _read_all(root)
    files_before = {d: _n_files(os.path.join(root, d))
                    for d in os.listdir(root) if "=" in d}
    assert max(files_before.values()) > 1   # the premise: small files

    rep = compact_partitions(root, target_rows=10_000)
    after = _read_all(root)
    pd.testing.assert_frame_equal(
        before, after.reindex(columns=before.columns))
    assert all(_n_files(os.path.join(root, d)) == 1
               for d in os.listdir(root) if "=" in d)
    assert rep["rows"].sum() == 600
    assert (rep["files_after"] < rep["files_before"]).all()

    # idempotent: a second run rewrites nothing
    rep2 = compact_partitions(root, target_rows=10_000)
    assert (rep2["files_before"] == rep2["files_after"]).all()
    pd.testing.assert_frame_equal(after, _read_all(root))


def test_compact_respects_target_rows(small_file_table):
    from zeeklog_ray.partitioned import compact_partitions

    root, df = small_file_table
    compact_partitions(root, target_rows=80)
    for d in os.listdir(root):
        if "=" not in d:
            continue
        sizes = [pq.read_metadata(os.path.join(root, d, f)).num_rows
                 for f in os.listdir(os.path.join(root, d))
                 if f.endswith(".parquet")]
        # greedy packing: every merged file stops at the first file that
        # reaches the target, so none is wildly over
        assert all(s <= 160 for s in sizes)
    pd.testing.assert_series_equal(
        _read_all(root)["event_id"].reset_index(drop=True),
        pd.Series(range(600), name="event_id"), check_dtype=False)


def test_recover_rolls_forward_after_journal(tmp_path):
    from zeeklog_ray.partitioned import compact_partition_dir

    d = str(tmp_path / "day=2024-06-01")
    os.makedirs(d)
    t1 = pa.table({"x": [1, 2]})
    t2 = pa.table({"x": [3]})
    pq.write_table(t1, os.path.join(d, "a.parquet"))
    pq.write_table(t2, os.path.join(d, "b.parquet"))
    merged = pa.concat_tables([t1, t2])
    pq.write_table(merged, os.path.join(d, "compact-xyz.parquet.tmp"))
    with open(os.path.join(d, "_compaction.journal"), "w") as f:
        json.dump({"olds": ["a.parquet", "b.parquet"],
                   "news": ["compact-xyz.parquet"]}, f)
    # crashed between journal write and commit -> next call rolls forward
    rep = compact_partition_dir(d, target_rows=10)
    files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    assert files == ["compact-xyz.parquet"]
    assert not os.path.exists(os.path.join(d, "_compaction.journal"))
    assert pq.read_table(os.path.join(d, "compact-xyz.parquet")) \
        .equals(merged)
    assert rep["files_before"] == 1  # recovery ran before planning


def test_recover_drops_orphan_tmps_without_journal(tmp_path):
    from zeeklog_ray.partitioned import compact_partition_dir

    d = str(tmp_path / "day=2024-06-01")
    os.makedirs(d)
    pq.write_table(pa.table({"x": [1, 2, 3]}),
                   os.path.join(d, "a.parquet"))
    pq.write_table(pa.table({"x": [9]}),
                   os.path.join(d, "compact-dead.parquet.tmp"))
    # crash BEFORE the journal: tmps are garbage, original untouched
    compact_partition_dir(d, target_rows=10)
    files = sorted(f for f in os.listdir(d))
    assert files == ["a.parquet"]


def test_torn_journal_rolls_back_keeping_originals(tmp_path):
    """An unparseable journal means the crash hit before the fsync'd
    commit point — recovery must drop tmps, keep originals, and clear
    the torn journal instead of raising forever (ADVICE r4)."""
    from zeeklog_ray.partitioned import compact_partition_dir

    d = str(tmp_path / "day=2024-06-01")
    os.makedirs(d)
    pq.write_table(pa.table({"x": [1, 2]}), os.path.join(d, "a.parquet"))
    pq.write_table(pa.table({"x": [3]}), os.path.join(d, "b.parquet"))
    pq.write_table(pa.table({"x": [9]}),
                   os.path.join(d, "compact-dead.parquet.tmp"))
    with open(os.path.join(d, "_compaction.journal"), "w") as f:
        f.write('{"olds": ["a.parquet", "b.par')  # torn mid-write
    rep = compact_partition_dir(d, target_rows=10)
    # originals survived the rollback, then the fresh run compacted them
    assert not os.path.exists(os.path.join(d, "compact-dead.parquet"))
    assert rep["files_before"] == 2 and rep["files_after"] == 1
    got = pq.read_table(
        os.path.join(d, [f for f in os.listdir(d)
                         if f.endswith(".parquet")][0]))
    assert sorted(got.column("x").to_pylist()) == [1, 2, 3]


def test_compact_zonemapped_dir_refreshes_manifest(ray_session, tmp_path):
    """VERDICT r4 #8: compaction of a zonemapped root must rebuild the
    manifest so scans keep pruning — and the zones stay correct."""
    import numpy as np
    import ray.data

    from zeeklog_ray.partitioned import (
        compact_partition_dir,
        write_sorted_zonemap,
        zonemap_files_for_range,
        zonemap_manifest_is_stale,
        zonemap_scan,
    )

    root = str(tmp_path / "zm")
    rng = np.random.default_rng(5)
    df = pd.DataFrame({"rid": np.arange(2000, dtype=np.int64),
                       "v": rng.permutation(2000).astype(np.int64)})
    write_sorted_zonemap(ray.data.from_pandas(df, override_num_blocks=4),
                         "v", root, num_files=8)
    rep = compact_partition_dir(root, target_rows=600)
    assert rep["files_after"] < rep["files_before"]
    with open(os.path.join(root, "manifest.json")) as f:
        manifest = json.load(f)
    assert not zonemap_manifest_is_stale(root, manifest)
    # pruning still works on the coarser zones
    touched = zonemap_files_for_range(manifest, 100, 150)
    assert 0 < len(touched) < rep["files_after"] + 1
    got = zonemap_scan(root, 100, 150).to_pandas()
    assert sorted(got["v"].tolist()) == list(range(100, 151))


def test_stale_manifest_falls_back_to_full_scan(ray_session, tmp_path):
    """A manifest that no longer matches the directory (e.g. an external
    rewrite) must not mis-prune: the guard abandons pruning and a full
    scan still returns the right rows."""
    import numpy as np
    import ray.data

    from zeeklog_ray.partitioned import (
        write_sorted_zonemap,
        zonemap_manifest_is_stale,
        zonemap_scan,
    )

    root = str(tmp_path / "zm")
    rng = np.random.default_rng(6)
    df = pd.DataFrame({"rid": np.arange(1000, dtype=np.int64),
                       "v": rng.permutation(1000).astype(np.int64)})
    write_sorted_zonemap(ray.data.from_pandas(df, override_num_blocks=3),
                         "v", root, num_files=4)
    # simulate an unrefreshed external rewrite: merge every file into one
    parts = sorted(f for f in os.listdir(root) if f.endswith(".parquet"))
    merged = pa.concat_tables(
        [pq.read_table(os.path.join(root, f)) for f in parts])
    for f in parts:
        os.remove(os.path.join(root, f))
    pq.write_table(merged, os.path.join(root, "rewritten.parquet"))
    with open(os.path.join(root, "manifest.json")) as f:
        manifest = json.load(f)
    assert zonemap_manifest_is_stale(root, manifest)
    got = zonemap_scan(root, 200, 250).to_pandas()
    assert sorted(got["v"].tolist()) == list(range(200, 251))
