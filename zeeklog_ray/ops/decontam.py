"""Benchmark decontamination: flag training documents sharing byte
k-grams with a (small) benchmark/eval set.

The standard training-data hygiene step (the reference engine has no
analog; this generalizes its IP-blocklist filtering idea — ``main.rs``'s
golden-IP scan — to content overlap): before training, every document
that contains any n-gram from a held-out benchmark must be dropped or
down-weighted, or eval scores are inflated.

Scale shape — a pure broadcast semi-join, ZERO shuffle:

* the benchmark side is small by construction (benchmarks are MBs even
  when the corpus is 100 TB), so its distinct packed-gram set is
  collected once, deduplicated on the driver, and broadcast via
  ``ray.put`` — every map task reads the same object-store copy, it is
  never re-shipped per batch;
* the corpus side streams through one ``map_batches`` stage (actor pool:
  the sorted gram array is bound once per actor in ``__init__``); each
  batch does one vectorized ``searchsorted`` membership probe over the
  concatenated gram windows of all its docs.  No groupby, no sort, no
  all-to-all — cost is a single read-scan of the corpus.

Grams are packed EXACTLY into uint64 (k ≤ 8, base-256 — injective, the
true gram set, not a hash), via the shared kernel
:func:`ops.dedup.packed_byte_windows` (one encoding for the dedup
verifiers and this scanner), so the contamination counts are exact
integers and the whole operator is bit-replayable in SQL
(``queries._decontam_oracle_sql``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

def _packed_kgram_pairs(texts: pd.Series, k: int
                        ) -> tuple[np.ndarray, np.ndarray]:
    """DISTINCT (doc_index, packed_gram) pairs for a batch, fully
    vectorized: the shared packing kernel
    (:func:`ops.dedup.packed_byte_windows`), then ONE lexsort +
    adjacent-diff dedup across the whole batch — no per-text
    ``np.unique`` Python loop, which dominates wall time when the
    operator scans the full corpus rather than a candidate list."""
    from zeeklog_ray.ops.dedup import packed_byte_windows

    packed, bounds, lengths = packed_byte_windows(texts, k)
    n_win = np.maximum(lengths - (k - 1), 0)
    if not len(packed) or not n_win.sum():
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    # valid window start positions per doc (mask out boundary windows)
    seg = np.repeat(np.arange(len(texts), dtype=np.int64), n_win)
    starts = np.repeat(bounds[:-1], n_win) + \
        (np.arange(len(seg)) - np.repeat(np.cumsum(n_win) - n_win, n_win))
    grams = packed[starts]
    order = np.lexsort((grams, seg))
    s, g = seg[order], grams[order]
    keep = np.r_[True, (s[1:] != s[:-1]) | (g[1:] != g[:-1])]
    return s[keep], g[keep]


def collect_benchmark_grams(bench_ds: "ray.data.Dataset",
                            text_col: str = "text", k: int = 8,
                            max_grams: int = 50_000_000) -> np.ndarray:
    """Distinct packed byte-k-grams of the benchmark set as a SORTED uint64
    array (the probe-side index).

    Per-batch distinct happens inside ``map_batches`` (only unique grams
    per batch cross the wire); the driver unions the per-batch arrays.
    ``max_grams`` is a guardrail: the benchmark side must be broadcastable
    (50M grams = 400 MB); a "benchmark" bigger than that is a misuse of
    this operator — raise instead of silently OOMing every worker.
    """

    def batch_grams(batch: pd.DataFrame) -> pd.DataFrame:
        _, grams = _packed_kgram_pairs(batch[text_col], k)
        return pd.DataFrame({"grams": [np.unique(grams)]})

    parts = bench_ds.map_batches(batch_grams, batch_format="pandas",
                                 batch_size=None).to_pandas()
    if len(parts) == 0:
        return np.empty(0, np.uint64)
    grams = np.unique(np.concatenate(list(parts["grams"])))
    if len(grams) > max_grams:
        raise ValueError(
            f"collect_benchmark_grams: {len(grams)} distinct grams exceeds "
            f"max_grams={max_grams} — the benchmark side must stay "
            "broadcast-sized; split it or raise the cap explicitly")
    return grams.astype(np.uint64)


class ContamProbe:
    """Actor-pool stage: per-doc benchmark-gram hit counts.

    ``grams_ref`` is the ``ray.put`` handle of the sorted benchmark gram
    array — resolved ONCE per actor here, not per batch.
    """

    def __init__(self, grams_ref, text_col: str = "text", k: int = 8,
                 id_col: str = "doc_id") -> None:
        self._grams = ray.get(grams_ref)
        self._text_col, self._id_col, self._k = text_col, id_col, k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        seg, allg = _packed_kgram_pairs(batch[self._text_col], self._k)
        lens = np.bincount(seg, minlength=len(batch)).astype(np.int64)
        bench = self._grams
        if len(bench) and len(allg):
            idx = np.searchsorted(bench, allg)
            np.minimum(idx, len(bench) - 1, out=idx)
            hit = bench[idx] == allg
        else:
            hit = np.zeros(len(allg), dtype=bool)
        # bincount segment-sum is safe for zero-gram docs (unlike reduceat)
        n_hit = np.bincount(seg[hit], minlength=len(batch)).astype(np.int64)
        out = pd.DataFrame({
            self._id_col: batch[self._id_col].to_numpy(),
            "n_grams": lens,
            "n_hit": n_hit,
        })
        out = out[out["n_hit"] > 0]
        # exact fixed-point contamination ratio (no float round-trip)
        out["contam_e4"] = (10_000 * out["n_hit"]) // out["n_grams"]
        return out


def benchmark_contamination(docs_ds: "ray.data.Dataset",
                            bench_ds: "ray.data.Dataset",
                            text_col: str = "text", k: int = 8,
                            id_col: str = "doc_id",
                            concurrency: int | tuple[int, int] | None = None
                            ) -> "ray.data.Dataset":
    """Contaminated-doc report: ``(id_col, n_grams, n_hit, contam_e4)`` for
    every training doc sharing ≥1 distinct byte-k-gram with the benchmark
    set.  ``contam_e4 = (10000 * n_hit) // n_grams``.

    Docs shorter than ``k`` bytes have no grams and can never be flagged.
    """
    grams_ref = ray.put(collect_benchmark_grams(bench_ds, text_col, k))
    return docs_ds.map_batches(
        ContamProbe, batch_format="pandas", batch_size=None,
        concurrency=concurrency or (1, 8),
        fn_constructor_kwargs={"grams_ref": grams_ref, "text_col": text_col,
                               "k": k, "id_col": id_col})
