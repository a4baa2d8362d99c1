"""Hive-partitioned Parquet output + partition-pruned reads.

The 100-TB output layout: ``write_partitioned`` lays data out as
``<root>/<col>=<value>/...`` (one directory per partition value, many
files per directory — resumable and independently re-readable), and
``read_partition`` scans ONLY the named partition's directory — pruning
at the PATH level, so a consumer of one slice never touches the other
partitions' bytes.  Path-level pruning is deliberate: Ray 2.49's
``read_parquet(filter=...)`` on a hive partition column crashes the
fragment sampler (measured round 1), and even where it works it still
lists every fragment; selecting the directory does neither.
"""

from __future__ import annotations

import ray.data


def write_partitioned(ds: "ray.data.Dataset", root: str,
                      cols: list[str]) -> None:
    """Write ``ds`` as hive-partitioned Parquet (``col=value`` dirs)."""
    ds.write_parquet(root, partition_cols=cols)


def read_partition(root: str, col: str, value: str) -> "ray.data.Dataset":
    """Read ONE partition by path (no full-dataset listing).  The hive
    directory scheme restores the partition column on read."""
    return ray.data.read_parquet(f"{root}/{col}={value}")
