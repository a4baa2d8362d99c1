"""JSONL export / import — the interchange format tokenizer and
training-data pipelines consume (one JSON object per line, one file per
block).

Ray-native: ``Dataset.write_json`` streams one shard file per block with
no driver materialization (resumable-output shape — a failed run re-emits
only missing shards when the upstream block layout is deterministic), and
``ray.data.read_json`` scans a shard directory back into a Dataset with
per-file parallelism.  JSON carries less type information than Parquet
(int64 survives; timestamps/binary need explicit encoding) — the
round-trip query in the registry (`docs_jsonl_roundtrip`) gates exactly
that fidelity on the integer/string document projection.
"""

from __future__ import annotations

import ray.data


def write_jsonl(ds: "ray.data.Dataset", out_dir: str) -> None:
    """One ``.json`` lines-format shard per block under ``out_dir``."""
    ds.write_json(out_dir)


def read_jsonl(path: str) -> "ray.data.Dataset":
    """Read a JSONL shard directory (or single file) back as a Dataset."""
    return ray.data.read_json(path)
