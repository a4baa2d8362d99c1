"""JSONL / CSV export + import — the interchange formats tokenizer and
training-data pipelines consume (one record per line, one file per
block).

Ray-native: ``Dataset.write_json`` / ``write_csv`` stream one shard file
per block with no driver materialization (resumable-output shape — a
failed run re-emits only missing shards when the upstream block layout is
deterministic), and ``ray.data.read_json`` / ``read_csv`` scan a shard
directory back into a Dataset with per-file parallelism.  Both formats
carry less type information than Parquet (int64 survives; timestamps /
binary need explicit encoding) — the round-trip queries in the registry
(`docs_jsonl_roundtrip`, `docs_csv_roundtrip`) gate exactly that fidelity
on the integer/string document projection against the ORIGINAL parquet.
"""

from __future__ import annotations

import ray.data


def write_jsonl(ds: "ray.data.Dataset", out_dir: str) -> None:
    """One ``.json`` lines-format shard per block under ``out_dir``."""
    ds.write_json(out_dir)


def read_jsonl(path: str) -> "ray.data.Dataset":
    """Read a JSONL shard directory (or single file) back as a Dataset."""
    return ray.data.read_json(path)


def write_csv(ds: "ray.data.Dataset", out_dir: str) -> None:
    """One headered ``.csv`` shard per block under ``out_dir``."""
    ds.write_csv(out_dir)


def read_csv(path: str) -> "ray.data.Dataset":
    """Read a CSV shard directory (or single file) back as a Dataset
    (schema inferred per Arrow's CSV reader)."""
    return ray.data.read_csv(path)
