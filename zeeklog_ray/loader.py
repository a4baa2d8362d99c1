"""Trainer-side loader: materialize loader-ready packed token rows and
iterate them as dense (micro_batch, context_len) matrices.

The packing math (`ops/packing.pack_assignments`) decides WHERE every
token goes — (source, pack_id, pack_offset) per doc, GPT-style
contiguous stream cut every ``context_len`` — but a trainer needs the
tokens THERE: fixed-width int32 rows it can feed a model.  This module
is that last mile:

* :func:`pack_token_rows` — build (source, pack_id, input_ids, n_real,
  pack_hash) rows.  Two token-volume exchanges, both unavoidable and
  both bucketed: one equi-join attaching each doc's tokens to its
  assignment (keys: doc_id), one (source, pack_id) exchange
  co-locating the PIECES of each pack (a doc that straddles a pack
  boundary splits row-locally into per-pack pieces first).  Assembly is
  fully vectorized: within a bucket, every piece's tokens scatter into
  the padded output matrix through ONE flat index expression — no
  per-doc or per-pack Python in the hot path.  ``pack_hash`` is the
  Horner(B=1000003) mod-2^64 hash of the REAL tokens (padding
  excluded), computed from one modular-inverse prefix scan per batch —
  the same bit-replayable family as ``ops/packing.chunk_tokens``, so
  the whole materialization is SQL-gated (queries.zeek_packed_rows).
* :func:`iter_token_batches` — stream the packed rows as numpy
  ``(micro_batch, context_len)`` int32 matrices via ``iter_batches``
  (optionally torch tensors when torch is importable — honest seam,
  this container has no torch).

Scale notes: packs are never driver-materialized — the packed Dataset
streams; ``iter_token_batches`` holds one micro-batch at a time plus
Ray's prefetch.  Reference analog: none (the reference has no trainer
interface); public GPT-2-style packed-loader shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

_HASH_BASE = 1000003
_HASH_BASE_INV = pow(_HASH_BASE, -1, 1 << 64)


def _pack_hashes(flat: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Horner(B) mod 2^64 hash of each segment flat[offs[i]:offs[i+1]]
    via one inverse-weighted prefix scan (the chunk_tokens machinery);
    empty segments hash to 0."""
    vals = flat.astype(np.uint64)
    n = len(vals)
    pw = np.ones(n + 1, dtype=np.uint64)
    if n:
        pw[1:] = np.multiply.accumulate(
            np.full(n, _HASH_BASE, dtype=np.uint64))
    ipw = np.ones(n, dtype=np.uint64)
    if n > 1:
        ipw[1:] = np.multiply.accumulate(
            np.full(n - 1, _HASH_BASE_INV, dtype=np.uint64))
    c = np.zeros(n + 1, dtype=np.uint64)
    if n:
        np.cumsum(vals * ipw, out=c[1:])
    s, e = offs[:-1], offs[1:]
    out = np.zeros(len(s), dtype=np.uint64)
    ok = e > s
    out[ok] = pw[e[ok] - 1] * (c[e[ok]] - c[s[ok]])
    return out


def pack_token_rows(ds: "ray.data.Dataset", *, context_len: int = 2048,
                    pad_id: int = 0, group_col: str = "source",
                    order_col: str = "doc_id", tokens_col: str = "tokens",
                    range_col: str = "date",
                    num_buckets: int = 256) -> "ray.data.Dataset":
    """Materialized packs: one row per (group, pack_id) with
    ``input_ids`` (list<int32>, length exactly ``context_len``,
    ``pad_id``-padded only in each group's final pack), ``n_real`` and
    the padding-free ``pack_hash``.  Input needs (order_col, tokens_col,
    n_tok, group_col, range_col) — the tokenized-corpus schema."""
    from zeeklog_ray.ops.packing import pack_assignments
    from zeeklog_ray.relational import bucketed_equi_join

    assign = pack_assignments(
        ds.select_columns([group_col, order_col, "n_tok", range_col]),
        group_col=group_col, order_col=order_col, len_col="n_tok",
        range_col=range_col, context_len=context_len,
        num_buckets=num_buckets)

    def as_assign(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[[order_col, "pack_id", "pack_offset"]]

    def tok_to_bytes(batch: pd.DataFrame) -> pd.DataFrame:
        # token payloads ship as BYTES through every exchange: Ray 2.49's
        # sort-based shuffles merge pandas blocks, and both
        # object-of-ndarray columns and Arrow list columns trip the
        # TensorArray concat there; int32.tobytes() round-trips exactly
        return pd.DataFrame({
            group_col: batch[group_col],
            order_col: batch[order_col],
            "_tb": [np.asarray(t, np.int32).tobytes()
                    for t in batch[tokens_col]]})

    toks = ds.select_columns([group_col, order_col, tokens_col]) \
        .map_batches(tok_to_bytes, batch_format="pandas",
                     batch_size=None)
    joined = bucketed_equi_join(
        toks,
        assign.map_batches(as_assign, batch_format="pandas",
                           batch_size=None),
        on=order_col, num_buckets=num_buckets)

    cl = context_len

    def pieces(batch: pd.DataFrame) -> pd.DataFrame:
        # split each doc row-locally into per-pack pieces: piece p of a
        # doc starting at global offset g = pack_id·cl + pack_offset
        # covers tokens [max(0, (first+p)·cl − g), …) — vectorized with
        # repeat/cumsum, no per-doc Python
        n = np.array([len(b) // 4 for b in batch["_tb"]], dtype=np.int64)
        g0 = (batch["pack_id"].to_numpy(np.int64) * cl
              + batch["pack_offset"].to_numpy(np.int64))
        first = g0 // cl
        last = np.where(n > 0, (g0 + n - 1) // cl, first)
        m = last - first + 1
        total = int(m.sum())
        doc_idx = np.repeat(np.arange(len(n)), m)
        p = np.arange(total) - np.repeat(np.cumsum(m) - m, m)
        pk = first[doc_idx] + p
        src_from = np.maximum(0, pk * cl - g0[doc_idx])
        src_to = np.minimum(n[doc_idx], (pk + 1) * cl - g0[doc_idx])
        dest = np.maximum(g0[doc_idx] - pk * cl, 0)
        keep = src_to > src_from
        flat = np.frombuffer(b"".join(batch["_tb"]), dtype=np.int32)
        starts = np.zeros(len(n) + 1, dtype=np.int64)
        np.cumsum(n, out=starts[1:])
        # gather every kept piece's tokens into one flat array + offsets
        # (vectorized: global index = piece start + intra-piece arange)
        kf, kt = src_from[keep], src_to[keep]
        kd = doc_idx[keep]
        plens = kt - kf
        ptotal = int(plens.sum())
        poffs = np.zeros(len(plens) + 1, dtype=np.int64)
        np.cumsum(plens, out=poffs[1:])
        gidx = (np.repeat(starts[kd] + kf, plens)
                + np.arange(ptotal, dtype=np.int64)
                - np.repeat(poffs[:-1], plens))
        gathered = flat[gidx] if ptotal else np.array([], dtype=np.int32)
        # token payload ships as BYTES: Ray's sort-based groupby merges
        # pandas blocks, and both object-of-ndarray columns and Arrow
        # list columns trip its TensorArray concat there (Ray 2.49);
        # int32.tobytes() round-trips exactly via np.frombuffer
        tok_bytes = [gathered[poffs[i]:poffs[i + 1]].tobytes()
                     for i in range(len(plens))]
        gvals = batch[group_col].to_numpy()[kd]
        bkt = (pd.util.hash_pandas_object(
            pd.DataFrame({group_col: gvals, "pack_id": pk[keep]}),
            index=False).to_numpy() % np.uint64(num_buckets)) \
            .astype("int64")
        return pd.DataFrame({
            group_col: gvals,
            "pack_id": pk[keep],
            "_dest": dest[keep],
            "_bucket": bkt,
            "_toks": tok_bytes})

    piece_rows = joined.map_batches(pieces, batch_format="pandas",
                                    batch_size=None)

    def assemble(group: pd.DataFrame) -> "pa.Table":
        # pyarrow output: a pandas object column of ndarrays trips Ray's
        # TensorArray block concat; the ListArray is also the zero-copy
        # layout downstream consumers want
        import pyarrow as pa

        g = group.sort_values([group_col, "pack_id", "_dest"],
                              kind="mergesort")
        codes, uniq = pd.factorize(
            pd.MultiIndex.from_arrays([g[group_col], g["pack_id"]]),
            use_na_sentinel=False)
        buf = b"".join(g["_toks"])
        flat = np.frombuffer(buf, dtype=np.int32)
        lens = np.array([len(t) // 4 for t in g["_toks"]],
                        dtype=np.int64)
        base = codes * cl + g["_dest"].to_numpy(np.int64)
        dest = (np.repeat(base, lens)
                + np.arange(int(lens.sum()), dtype=np.int64)
                - np.repeat(np.cumsum(lens) - lens, lens))
        n_packs = len(uniq)
        out = np.full(n_packs * cl, pad_id, dtype=np.int32)
        out[dest] = flat
        n_real = np.zeros(n_packs, dtype=np.int64)
        np.add.at(n_real, codes, lens)
        # padding-free hash: real tokens are CONTIGUOUS from slot 0 of
        # each pack (the stream is gap-free by construction), so hash
        # out[r·cl : r·cl + n_real[r]] per pack from one prefix scan
        offs = np.zeros(n_packs + 1, dtype=np.int64)
        np.cumsum(n_real, out=offs[1:])
        packed_real = np.concatenate(
            [out[r * cl:r * cl + n_real[r]] for r in range(n_packs)]) \
            if n_packs else np.array([], dtype=np.int32)
        hashes = _pack_hashes(packed_real, offs)
        list_offs = (np.arange(n_packs + 1, dtype=np.int64) * cl)
        return pa.table({
            group_col: pa.array([u[0] for u in uniq]),
            "pack_id": pa.array(
                np.array([u[1] for u in uniq], dtype=np.int64)),
            "input_ids": pa.LargeListArray.from_arrays(
                pa.array(list_offs, pa.int64()),
                pa.array(out, pa.int32())),
            "n_real": pa.array(n_real),
            "pack_hash": pa.array(hashes.astype(np.int64))})

    return piece_rows.groupby("_bucket").map_groups(
        assemble, batch_format="pandas")


def iter_token_batches(packed: "ray.data.Dataset", micro_batch: int,
                       *, to_torch: bool = False,
                       local_shuffle_buffer: int | None = None,
                       seed: int | None = None,
                       shard: tuple[int, int] | None = None):
    """Yield dense (micro_batch, context_len) int32 matrices from a
    :func:`pack_token_rows` Dataset — the trainer feed.  Streaming: one
    micro-batch in memory at a time (plus Ray's prefetch); pass
    ``local_shuffle_buffer`` rows for loader-side shuffling.  The final
    batch may be shorter unless the pack count divides evenly.

    ``shard=(i, n)`` gives data-parallel worker ``i`` of ``n`` its
    deterministic slice — packs with ``pack_id % n == i`` — a row-local
    filter, so every worker streams only its shard with no coordination
    and a restarted worker re-derives the same slice (resume = skip
    already-consumed batch indices).  Shards are balanced to ±1 pack
    per (source, shard) because pack_ids are dense per source.

    With ``to_torch=True`` tensors are returned when torch is
    importable — this container has none, so the seam raises
    honestly."""
    if to_torch:
        try:
            import torch
        except ImportError as e:
            raise NotImplementedError(
                "to_torch=True needs torch, which is not installed in "
                "this environment — consume the numpy batches or install "
                "torch") from e
    if shard is not None:
        i, n = shard
        if not 0 <= i < n:
            raise ValueError(f"shard index {i} outside [0, {n})")

        def keep_shard(batch: pd.DataFrame) -> pd.DataFrame:
            return batch[batch["pack_id"] % n == i]

        packed = packed.map_batches(keep_shard, batch_format="pandas",
                                    batch_size=None)
    for batch in packed.iter_batches(
            batch_size=micro_batch, batch_format="pandas",
            local_shuffle_buffer_size=local_shuffle_buffer,
            local_shuffle_seed=seed):
        mat = np.stack([np.asarray(r, dtype=np.int32)
                        for r in batch["input_ids"]])
        yield torch.from_numpy(mat) if to_torch else mat
