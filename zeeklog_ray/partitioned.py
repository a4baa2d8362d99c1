"""Hive-partitioned Parquet output + partition-pruned reads, and
range-sorted zone-map export + range-pruned scans.

The 100-TB output layout: ``write_partitioned`` lays data out as
``<root>/<col>=<value>/...`` (one directory per partition value, many
files per directory — resumable and independently re-readable), and
``read_partition`` scans ONLY the named partition's directory — pruning
at the PATH level, so a consumer of one slice never touches the other
partitions' bytes.  Path-level pruning is deliberate: Ray 2.49's
``read_parquet(filter=...)`` on a hive partition column crashes the
fragment sampler (measured round 1), and even where it works it still
lists every fragment; selecting the directory does neither.

Zone maps extend the same idea to RANGE predicates on a numeric/orderable
column: ``write_sorted_zonemap`` range-partitions by sampled boundaries
(the ``relational.global_rank`` boundary scheme), each range sorts and
writes its own Parquet file, and a ``manifest.json`` records per-file
``[min, max]``.  ``zonemap_scan(lo, hi)`` then opens ONLY the files whose
zone overlaps the predicate — at 10^12 rows a selective range touches a
handful of files instead of every block, which is the difference between
an index lookup and a full scan.
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np
import pandas as pd

import ray
import ray.data


def write_partitioned(ds: "ray.data.Dataset", root: str,
                      cols: list[str]) -> None:
    """Write ``ds`` as hive-partitioned Parquet (``col=value`` dirs)."""
    ds.write_parquet(root, partition_cols=cols)


def read_partition(root: str, col: str, value: str) -> "ray.data.Dataset":
    """Read ONE partition by path (no full-dataset listing).  The hive
    directory scheme restores the partition column on read."""
    return ray.data.read_parquet(f"{root}/{col}={value}")


def write_sorted_zonemap(ds: "ray.data.Dataset", col: str, root: str,
                         num_files: int = 64, sample_n: int = 8192,
                         seed: int = 7) -> dict:
    """Range-sorted Parquet export with a zone-map manifest.

    Shape: sample ``col`` for range boundaries (deterministic seed, the
    ``global_rank`` scheme), tag each row with its range bucket
    row-locally, then ONE bucketed shuffle where each range sorts itself
    and writes its own file (``part-<bucket>.parquet``, tempfile +
    ``os.replace`` so a re-run of a failed range is atomic — the
    resumable-output contract).  Only the one-row-per-file stats table
    returns to the driver, which writes ``manifest.json``:
    ``{"col", "files": [{"path", "min", "max", "rows"}, ...]}``.

    Sorting is a global all-to-all by construction (same as any ORDER BY);
    everything after it is file-local.  Null sort keys are rejected like
    ``global_rank`` (make the null policy explicit upstream).  Returns the
    manifest dict."""
    from zeeklog_ray.relational import sampled_range_boundaries

    os.makedirs(root, exist_ok=True)
    proj = ds.materialize()
    if proj.count() == 0:
        raise ValueError("write_sorted_zonemap: empty dataset")
    boundaries = sampled_range_boundaries(proj, col, num_files, sample_n,
                                          seed, ctx="write_sorted_zonemap")
    bref = ray.put(boundaries)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        if batch[col].isna().any():
            raise ValueError(f"write_sorted_zonemap: null values in {col!r}")
        batch = batch.copy()
        batch["_rb"] = np.searchsorted(
            ray.get(bref), batch[col].to_numpy(),
            side="right").astype(np.int64)
        return batch

    def write_range(group: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.parquet as pq

        b = int(group["_rb"].iloc[0])
        g = group.sort_values(col, kind="mergesort").drop(columns=["_rb"])
        path = os.path.join(root, f"part-{b:05d}.parquet")
        fd, tmp = tempfile.mkstemp(dir=root, suffix=".parquet.tmp")
        os.close(fd)
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False), tmp)
        os.replace(tmp, path)
        lo, hi = g[col].iloc[0], g[col].iloc[-1]
        return pd.DataFrame({"path": [path],
                             "min": [lo], "max": [hi],
                             "rows": [np.int64(len(g))]})

    stats = proj.map_batches(assign, batch_format="pandas",
                             batch_size=None) \
        .groupby("_rb").map_groups(write_range, batch_format="pandas") \
        .to_pandas().sort_values("path")
    manifest = {"col": col, "files": [
        {"path": r.path, "min": _json_bound(r.min, col),
         "max": _json_bound(r.max, col), "rows": int(r.rows)}
        for r in stats.itertuples()]}
    # atomic like the part files: a process killed mid-dump must not
    # leave a truncated manifest that reads as a completed export
    fd, tmp = tempfile.mkstemp(dir=root, suffix=".json.tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(root, "manifest.json"))
    return manifest


def _json_bound(v, col: str):
    """Zone bound → JSON with EXACT round-tripping: int stays int (a
    float() coercion silently rounds int64 above 2^53 — a pruned file
    could then hide matching rows), float stays float, str stays str.
    Other dtypes (datetime64, decimal) are rejected rather than corrupted;
    cast to int64 epoch / string upstream."""
    if isinstance(v, (bool, np.bool_)):
        raise TypeError(f"write_sorted_zonemap: boolean sort key {col!r} "
                        "makes no range sense")
    if isinstance(v, (int, np.integer)):
        return int(v)
    if isinstance(v, (float, np.floating)):
        return float(v)
    if isinstance(v, str):
        return v
    raise TypeError(
        f"write_sorted_zonemap: sort key {col!r} has unsupported dtype "
        f"{type(v).__name__} for a JSON zone bound — cast to int64 "
        "(e.g. epoch micros), float, or string upstream")


def zonemap_files_for_range(manifest: dict, lo, hi) -> list[str]:
    """Paths whose zone ``[min, max]`` intersects ``[lo, hi]`` — the
    pruning decision, separated out so tests can assert exactly which
    files a predicate touches."""
    return [f["path"] for f in manifest["files"]
            if not (f["max"] < lo or f["min"] > hi)]


def zonemap_scan(root: str, lo, hi) -> "ray.data.Dataset":
    """Range query over a :func:`write_sorted_zonemap` export: open ONLY
    the overlapping files (zone pruning), then a row-local Arrow filter
    trims the two boundary files.  An empty intersection still reads one
    file's schema (and filters everything) so the result Dataset keeps
    its columns — the empty-``to_pandas`` schema-loss quirk is documented
    in BASELINE.md."""
    import pyarrow.compute as pc

    with open(os.path.join(root, "manifest.json")) as f:
        manifest = json.load(f)
    col = manifest["col"]
    paths = zonemap_files_for_range(manifest, lo, hi)
    if not paths:
        paths = [manifest["files"][0]["path"]]

    def trim(batch):
        keep = pc.and_(pc.greater_equal(batch[col], lo),
                       pc.less_equal(batch[col], hi))
        return batch.filter(keep)

    return ray.data.read_parquet(paths).map_batches(
        trim, batch_format="pyarrow", batch_size=None)
