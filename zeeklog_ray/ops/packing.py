"""Sequence packing: assign tokenized docs to fixed-size context bins.

LLM pretraining concatenates documents in a deterministic order and slices
the stream into ``context_len``-token examples; the pack id of a document
is ``start_offset // context_len`` where ``start_offset`` is the total
token count of every earlier document in the same group (concat-and-chunk
attribution: a doc belongs to the pack its first token lands in).

The hard part at scale is the PREFIX SUM: a naive per-group ordered cumsum
needs the whole group in memory — a non-starter when one source holds
10^11 sequences.  This module implements the classic TWO-LEVEL distributed
prefix sum instead:

  pass 1  one ``map_batches`` computes per-(group, range) token subtotals
          (a combiner: rows crossing the wire = groups × ranges, not docs);
          the driver turns the tiny subtotal table into EXCLUSIVE base
          offsets per (group, range) and broadcasts them via ``ray.put``.
  pass 2  rows shuffle once, bucketed by (group, range); inside a bucket
          each (group, range) segment sorts by ``order_col``, takes a
          C-level cumsum, and adds its broadcast base offset.

``range_col`` must be MONOTONE in ``order_col`` within each group (sorting
by ``order_col`` globally ≡ sorting by ``(range_col, order_col)``) — for
the zeek corpus, ``date`` qualifies because doc_id embeds the date
(``d-<date>-<source>-<seq>``).  Memory per task is then bounded by the
largest (group, range) cell, not the largest group: at 10^12 sequences,
ranging by date(+hour) keeps cells at file-partition scale.  The reference
has no packing (it renders, zeek_log.rs:332-362); this is part of the
LLM-pipeline family the brief adds.
"""

from __future__ import annotations

import pandas as pd

import ray
import ray.data

from zeeklog_ray.relational import grouped_sum, with_hash_bucket


def pack_assignments(ds: "ray.data.Dataset", *, group_col: str = "source",
                     order_col: str = "doc_id", len_col: str = "n_tok",
                     range_col: str = "date", context_len: int = 2048,
                     num_buckets: int = 256) -> "ray.data.Dataset":
    """Per-doc pack assignment: (group, order, len, pack_id, pack_offset).

    ``pack_offset`` is the doc's first-token position within its pack —
    downstream writers need it to place the doc without recomputing the
    scan.  Deterministic and partition-independent: the assignment depends
    only on the (group, order) total order, never on block layout.
    """
    # ---- pass 1: per-(group, range) subtotals → exclusive base offsets
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = (batch.groupby([group_col, range_col], sort=False)[len_col]
             .sum().reset_index(name="_sub"))
        return g

    subtotals = (ds.map_batches(partial, batch_format="pandas",
                                batch_size=None)
                 .to_pandas()
                 .groupby([group_col, range_col], sort=False)["_sub"]
                 .sum().reset_index())
    # exclusive prefix within each group, ranges in order_col order (the
    # monotonicity contract makes range_col order == order_col order)
    subtotals = subtotals.sort_values([group_col, range_col],
                                      kind="mergesort")
    csum = subtotals.groupby(group_col, sort=False)["_sub"].cumsum()
    subtotals["_base"] = (csum - subtotals["_sub"]).astype("int64")
    bases = {(g, r): int(b) for g, r, b in zip(
        subtotals[group_col], subtotals[range_col], subtotals["_base"])}
    bases_ref = ray.put(bases)

    # ---- pass 2: one bucketed shuffle, per-cell sort + cumsum + base
    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(bases_ref)
        g = group.sort_values([group_col, range_col, order_col],
                              kind="mergesort")
        lens = g[len_col].astype("int64")
        csum = lens.groupby(
            [g[group_col], g[range_col]], sort=False).cumsum()
        start = (csum - lens).to_numpy()
        base = [b[(gr, rr)] for gr, rr in zip(g[group_col], g[range_col])]
        off = start + pd.Series(base, index=g.index).to_numpy()
        out = pd.DataFrame({
            group_col: g[group_col].to_numpy(),
            order_col: g[order_col].to_numpy(),
            len_col: lens.to_numpy(),
            "pack_id": off // context_len,
            "pack_offset": off % context_len,
        })
        return out

    bucketed = with_hash_bucket(ds, [group_col, range_col], num_buckets)
    return bucketed.groupby("_bucket").map_groups(per_bucket,
                                                  batch_format="pandas")


def pack_stats(ds: "ray.data.Dataset", *, group_col: str = "source",
               order_col: str = "doc_id", len_col: str = "n_tok",
               range_col: str = "date", context_len: int = 2048,
               num_buckets: int = 256) -> "ray.data.Dataset":
    """Rollup per (group, pack_id): n_docs + token sum — the compact
    oracle-friendly view (output rows ≈ total_tokens / context_len)."""
    assigned = pack_assignments(
        ds, group_col=group_col, order_col=order_col, len_col=len_col,
        range_col=range_col, context_len=context_len,
        num_buckets=num_buckets)

    return grouped_sum(assigned, [group_col, "pack_id"],
                       sums={len_col: "sum_tok"}, count_as="n_docs")
