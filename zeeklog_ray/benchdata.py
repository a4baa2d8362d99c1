"""Deterministic large-scale synthetic tables for the scale benches.

The driver's testdata tops out around 10^5 rows per table; certifying the
bucketed-groupby operators' headroom (VERDICT r2 item 6: windows / sessions /
near-dup components at ≥5M events / 1M docs) needs purpose-built inputs.
Generation is seed-fixed, chunked (bounded memory), written as multi-file
Parquet (so the read parallelizes), cached under the corpus cache root with
a ``_SUCCESS`` marker, and NEVER timed — bench.py generates before starting
the clock.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

from zeeklog_ray.corpus import _CACHE_ROOT

_CHUNK = 500_000


def _finalize(tmp: str, out_dir: str) -> str:
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("ok\n")
    try:
        os.rename(tmp, out_dir)
    except OSError:                      # concurrent generator won the race
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return out_dir


def _write_sharded(t, tmp: str, chunk_idx: int, n_total: int) -> None:
    """Write one generated chunk as ~``n_total/32``-row shard files so a
    bench corpus always has ≥ ~32 independent Parquet fragments.  Ray
    parallelizes parquet reads per FILE (a single-file corpus reads
    through ONE task regardless of downstream block splitting — measured
    as a 4.5 s single-thread decode floor under EVERY pass over the
    200k-long-doc corpus); sharding lifts that floor for every bench
    entry.  One row group per shard."""
    import pyarrow.parquet as pq

    shard_rows = max(25_000, n_total // 32 + 1)
    for j, lo in enumerate(range(0, t.num_rows, shard_rows)):
        pq.write_table(t.slice(lo, shard_rows),
                       os.path.join(tmp, f"part-{chunk_idx:04d}-{j:03d}"
                                         ".parquet"))


def bench_events_parquet(n_rows: int = 5_000_000, n_users: int = 100_000,
                         seed: int = 31) -> str:
    """Events table (user_id:int64, ts:timestamp[us], value:float64) —
    ``n_rows`` over ``n_users`` keys across 30 days, the input shape of
    trailing_windows / sessionize at certification scale."""
    out_dir = os.path.join(
        _CACHE_ROOT, f"bench-events-v2-n{n_rows}-u{n_users}-s{seed}")
    if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        return out_dir
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(_CACHE_ROOT, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix="bench-events-", dir=_CACHE_ROOT)
    try:
        rng = np.random.default_rng(seed)
        base = np.datetime64("2024-06-01T00:00:00", "us")
        for i, lo in enumerate(range(0, n_rows, _CHUNK)):
            n = min(_CHUNK, n_rows - lo)
            ts = base + rng.integers(0, 30 * 86400, n) * np.timedelta64(1_000_000, "us")
            t = pa.table({
                "user_id": pa.array(rng.integers(0, n_users, n), pa.int64()),
                "ts": pa.array(ts),
                "value": pa.array(np.round(rng.exponential(20.0, n), 2)),
            })
            _write_sharded(t, tmp, i, n_rows)
        return _finalize(tmp, out_dir)
    except BaseException:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        raise


def bench_docs_parquet(n_docs: int = 1_000_000, dup_rate: float = 0.10,
                       n_words: int = 18, seed: int = 37) -> str:
    """Documents table (doc_id:int64, text:string) with PLANTED duplicate
    clusters: ``dup_rate`` of the docs copy an earlier doc verbatim (exact
    near-dup clusters the MinHash banding must catch), the rest are random
    word sequences.  Word-pool text keeps shingle entropy realistic while
    the vectorized generator stays fast (~1M docs in tens of seconds)."""
    wtag = f"-w{n_words}" if n_words != 18 else ""
    out_dir = os.path.join(
        _CACHE_ROOT,
        f"bench-docs-v2-n{n_docs}-d{int(dup_rate * 100)}-s{seed}{wtag}")
    if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        return out_dir
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(_CACHE_ROOT, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix="bench-docs-", dir=_CACHE_ROOT)
    try:
        rng = np.random.default_rng(seed)
        # 4096-word pool of 5-9 letter pseudo-words
        letters = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", np.uint8)
        pool = np.array(["".join(chr(c) for c in
                                 letters[rng.integers(0, 26, rng.integers(5, 10))])
                        for _ in range(4096)])
        # dup sources: first 2% of ids, capped at the first chunk (the only
        # texts retained across chunks — an uncapped n_src > _CHUNK would
        # index past src_texts at n_docs > 25M)
        n_src = max(1, min(int(n_docs * 0.02), min(_CHUNK, n_docs)))
        src_texts: np.ndarray | None = None
        for i, lo in enumerate(range(0, n_docs, _CHUNK)):
            n = min(_CHUNK, n_docs - lo)
            words = pool[rng.integers(0, len(pool), (n, n_words))]
            # one vectorized join per chunk (reduce over the word columns)
            texts = words[:, 0]
            for c in range(1, n_words):
                texts = np.char.add(np.char.add(texts, " "), words[:, c])
            if src_texts is None:            # first chunk carries the sources
                src_texts = texts[:n_src].copy()
            is_dup = rng.random(n) < dup_rate
            ids = np.arange(lo, lo + n)
            is_dup &= ids >= n_src           # sources stay unique
            texts[is_dup] = src_texts[rng.integers(0, n_src, int(is_dup.sum()))]
            t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                          "text": pa.array(texts.tolist(), pa.string())})
            _write_sharded(t, tmp, i, n_docs)
        return _finalize(tmp, out_dir)
    except BaseException:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        raise
