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


def write_orc(ds: "ray.data.Dataset", out_dir: str) -> int:
    """One ORC file per block under ``out_dir`` (atomic tmp+rename per
    file — the resumable-output contract), via ``pyarrow.orc`` inside
    ``map_batches``: Ray 2.49 has no native ORC sink, and this is the
    canonical way to graft one on — the write happens WHERE the block
    lives, nothing routes through the driver.  ORC carries full Arrow
    types (timestamps, lists), unlike the CSV/JSONL hops; the
    ``events_orc_roundtrip`` oracle gates exactly that fidelity.
    Returns the number of rows written (consumes the pipeline)."""
    import os
    import tempfile
    import uuid

    import pyarrow as pa

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: "pa.Table") -> "pa.Table":
        import pyarrow.orc as orc

        if batch.num_rows == 0:
            return pa.table({"rows": pa.array([], pa.int64())})
        name = f"part-{uuid.uuid4().hex[:12]}.orc"
        fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".orc.tmp")
        os.close(fd)
        orc.write_table(batch, tmp)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table({"rows": pa.array([batch.num_rows], pa.int64())})

    stats = ds.map_batches(write_block, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    return int(stats["rows"].sum()) if len(stats) else 0


def read_orc(path: str) -> "ray.data.Dataset":
    """Read an ORC shard directory (or single file) back as a Dataset
    with per-FILE parallelism: one task opens one file (the listing is
    driver-side metadata only, like every Ray read_* source)."""
    import glob
    import os

    import pandas as pd
    import pyarrow as pa

    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.orc")))
    else:
        files = [path]
    if not files:
        raise ValueError(f"read_orc: no .orc files under {path}")

    def load(batch: "pd.DataFrame") -> "pa.Table":
        import pyarrow.orc as orc

        tables = [orc.read_table(p) for p in batch["path"]]
        return tables[0] if len(tables) == 1 else pa.concat_tables(tables)

    return ray.data.from_items([{"path": f} for f in files]) \
        .repartition(len(files)) \
        .map_batches(load, batch_format="pandas", batch_size=None)


def write_feather(ds: "ray.data.Dataset", out_dir: str) -> int:
    """One Feather (Arrow IPC) file per block — the zero-parse local
    interchange format (mmap-able, full Arrow types); same grafted-sink
    shape as :func:`write_orc`.  Returns rows written."""
    import os
    import tempfile
    import uuid

    import pyarrow as pa

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: "pa.Table") -> "pa.Table":
        import pyarrow.feather as feather

        if batch.num_rows == 0:
            return pa.table({"rows": pa.array([], pa.int64())})
        name = f"part-{uuid.uuid4().hex[:12]}.feather"
        fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".feather.tmp")
        os.close(fd)
        feather.write_feather(batch, tmp)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table({"rows": pa.array([batch.num_rows], pa.int64())})

    stats = ds.map_batches(write_block, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    return int(stats["rows"].sum()) if len(stats) else 0


def read_feather(path: str) -> "ray.data.Dataset":
    """Read a Feather shard directory (or single file) with per-file
    task parallelism (same source shape as :func:`read_orc`)."""
    import glob
    import os

    import pandas as pd
    import pyarrow as pa

    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.feather")))
    else:
        files = [path]
    if not files:
        raise ValueError(f"read_feather: no .feather files under {path}")

    def load(batch: "pd.DataFrame") -> "pa.Table":
        import pyarrow.feather as feather

        tables = [feather.read_table(p) for p in batch["path"]]
        return tables[0] if len(tables) == 1 else pa.concat_tables(tables)

    return ray.data.from_items([{"path": f} for f in files]) \
        .repartition(len(files)) \
        .map_batches(load, batch_format="pandas", batch_size=None)
