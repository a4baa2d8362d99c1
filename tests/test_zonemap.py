"""Zone-map sorted export + range-pruned scan (partitioned.py)."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

import ray.data

from zeeklog_ray.partitioned import (
    write_sorted_zonemap,
    zonemap_files_for_range,
    zonemap_scan,
)


def _frame(n=1000, seed=5):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "rid": np.arange(n, dtype=np.int64),
        "v": rng.permutation(n).astype(np.int64),     # unique, shuffled
        "payload": rng.integers(0, 100, n).astype(np.int64),
    })


@pytest.fixture(scope="module")
def export(ray_session, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("zm"))
    df = _frame()
    ds = ray.data.from_pandas(df, override_num_blocks=7)
    manifest = write_sorted_zonemap(ds, "v", root, num_files=8)
    return root, df, manifest


def test_manifest_covers_all_rows_disjoint_zones(export):
    root, df, manifest = export
    assert manifest["col"] == "v"
    files = manifest["files"]
    assert 1 < len(files) <= 8
    assert sum(f["rows"] for f in files) == len(df)
    # zones are disjoint and ordered (equal values colocate by
    # searchsorted side='right', and v is unique here)
    for a, b in zip(files, files[1:]):
        assert a["max"] < b["min"]
    # manifest really is on disk
    with open(os.path.join(root, "manifest.json")) as f:
        assert json.load(f) == manifest


def test_files_internally_sorted_and_stats_exact(export):
    root, _, manifest = export
    for f in manifest["files"]:
        t = pq.read_table(f["path"]).to_pandas()
        v = t["v"].to_numpy()
        assert (np.diff(v) >= 0).all()
        assert v[0] == f["min"] and v[-1] == f["max"]
        assert len(t) == f["rows"]
        assert "_rb" not in t.columns


def test_pruning_touches_a_strict_subset(export):
    _, df, manifest = export
    n_files = len(manifest["files"])
    # a range inside one zone touches exactly one file
    mid = manifest["files"][2]
    one = zonemap_files_for_range(manifest, mid["min"] + 1, mid["min"] + 2)
    assert len(one) == 1
    # a ~20%-selective range touches a strict subset
    some = zonemap_files_for_range(manifest, 100, 299)
    assert 0 < len(some) < n_files


def test_scan_parity_with_plain_filter(export, ray_session):
    root, df, _ = export
    lo, hi = 150, 449
    got = zonemap_scan(root, lo, hi).to_pandas() \
        .sort_values("rid").reset_index(drop=True)
    exp = df[(df["v"] >= lo) & (df["v"] <= hi)] \
        .sort_values("rid").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["rid", "v", "payload"]], exp[["rid", "v", "payload"]])


def test_scan_empty_range_keeps_schema(export, ray_session):
    root, _, _ = export
    out = zonemap_scan(root, 10_000, 20_000)
    assert out.count() == 0
    assert set(out.schema().names) == {"rid", "v", "payload"}


def test_null_sort_key_rejected(ray_session, tmp_path):
    df = pd.DataFrame({"rid": [1, 2], "v": [1.0, np.nan]})
    ds = ray.data.from_pandas(df)
    with pytest.raises(Exception, match="null values"):
        write_sorted_zonemap(ds, "v", str(tmp_path / "z"), num_files=2)


def test_empty_dataset_rejected(ray_session, tmp_path):
    df = pd.DataFrame({"rid": pd.Series([], dtype="int64"),
                       "v": pd.Series([], dtype="int64")})
    ds = ray.data.from_pandas(df)
    with pytest.raises(ValueError, match="empty dataset"):
        write_sorted_zonemap(ds, "v", str(tmp_path / "z"), num_files=2)


def test_rewrite_is_idempotent(ray_session, tmp_path):
    """A second export over the same root replaces files atomically and
    the manifest stays consistent (the resume story: re-running a failed
    export converges)."""
    root = str(tmp_path / "z")
    df = _frame(n=200, seed=9)
    ds = ray.data.from_pandas(df, override_num_blocks=3)
    m1 = write_sorted_zonemap(ds, "v", root, num_files=4)
    m2 = write_sorted_zonemap(ds, "v", root, num_files=4)
    assert m1 == m2
    got = zonemap_scan(root, 0, 10**9).to_pandas()
    assert len(got) == len(df)


def test_zonemap_int64_bounds_above_2_53_stay_exact(ray_session, tmp_path):
    """Zone bounds must round-trip int64 exactly — a float() coercion
    rounds above 2^53 and a pruned file could hide matching rows."""
    base = (1 << 62) + 1_000_000_000
    vals = base + np.arange(0, 4000, dtype=np.int64)
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"rid": np.arange(4000, dtype=np.int64),
                       "v": rng.permutation(vals)})
    root = str(tmp_path / "big")
    m = write_sorted_zonemap(ray.data.from_pandas(df, override_num_blocks=3),
                             "v", root, num_files=6)
    for f in m["files"]:
        assert isinstance(f["min"], int) and isinstance(f["max"], int)
    lo, hi = base + 1001, base + 1013
    got = zonemap_scan(root, lo, hi).to_pandas().sort_values("v")
    assert got["v"].tolist() == list(range(lo, hi + 1))


def test_zonemap_unsupported_bound_dtype_raises(ray_session, tmp_path):
    df = pd.DataFrame({"rid": [1, 2, 3],
                       "v": pd.to_datetime(["2024-01-01", "2024-01-02",
                                            "2024-01-03"])})
    with pytest.raises(Exception, match="unsupported dtype|null values"):
        write_sorted_zonemap(ray.data.from_pandas(df), "v",
                             str(tmp_path / "dt"), num_files=2)
