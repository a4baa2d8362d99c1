"""Keyword retrieval: distributed integer TF-IDF top-k over a corpus.

The text complement of the embedding ANN family (ops/similarity.py):
given a bag of query terms, rank documents by Σ_term tf(term, doc) ×
idf_scaled(term) and return the top-k — the classic sparse-retrieval
baseline (and the first stage of a RAG stack before any dense rerank).

Scale shape — shuffle volume is O(postings that MATCH the query), never
the corpus:

1. ONE corpus pass: per batch, whitespace-split, filter to the broadcast
   query-term set, count (doc, term) term frequencies with a C-level
   groupby.  A document lives entirely inside one batch, so the per-batch
   tf rows are already COMPLETE — no shuffle is needed to finish them.
   The same pass emits one sentinel row per batch carrying the batch's
   doc count, so corpus size N needs no second scan.
2. df per term folds on the driver (≤ n_blocks × |terms| partial rows —
   the term set is query-sized by construction).
3. idf_scaled(term) = (N · idf_scale) // df(term) — integer-exact, so
   scores hash-replay in SQL without float drift.
4. A second pass over the PINNED match rows scores each doc row-locally
   (broadcast idf dict) and emits per-batch top-k partials; the driver
   merges k·n_blocks rows.  Ties break on doc_id ascending —
   deterministic across block layouts.

Reference analog: none (the reference has no search); public
inverted-index/TF-IDF shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from zeeklog_ray.spill import pin_or_spill

_N_SENTINEL = ""        # term value carrying per-batch doc counts


def _match_rows(texts: pd.Series, ids: np.ndarray,
                terms: frozenset) -> pd.DataFrame:
    """(doc_id, term, tf) rows for query-term matches in one batch, plus
    the N-sentinel row.  Vectorized explode + isin + one groupby."""
    words = texts.str.split()
    n_words = words.str.len().to_numpy(np.int64)
    flat = pd.Series(np.concatenate(words.to_numpy())
                     if n_words.sum() else np.array([], dtype=object))
    doc_of = np.repeat(ids, n_words)
    m = flat.isin(terms).to_numpy()
    tf = (pd.DataFrame({"doc_id": doc_of[m], "term": flat.to_numpy()[m]})
          .groupby(["doc_id", "term"], sort=False).size()
          .rename("tf").reset_index())
    sent = pd.DataFrame({"doc_id": [-1], "term": [_N_SENTINEL],
                         "tf": [len(ids)]})
    return pd.concat([tf, sent], ignore_index=True)


def keyword_search(docs: "ray.data.Dataset", query_terms: list[str],
                   k: int = 10, text_col: str = "text",
                   id_col: str = "doc_id", idf_scale: int = 10_000,
                   spill_dir: str | None = None) -> "ray.data.Dataset":
    """Top-``k`` documents for ``query_terms`` by integer TF-IDF.

    Returns (doc_id, score) sorted by score desc, doc_id asc — exactly
    ``ORDER BY score DESC, doc_id LIMIT k`` over
    ``SUM(tf · (N·idf_scale) // df)`` in SQL (see module docstring for
    why every quantity is integer-exact).  Terms match corpus tokens
    byte-exactly after whitespace splitting; normalize both sides first
    (ops/dedup.normalize_text) for case-folded retrieval."""
    qterms = frozenset(t for t in query_terms if t)
    if not qterms:
        return ray.data.from_pandas(pd.DataFrame(
            {id_col: pd.Series(dtype="int64"),
             "score": pd.Series(dtype="int64")}))
    tref = ray.put(qterms)

    def match(batch: pd.DataFrame) -> pd.DataFrame:
        out = _match_rows(batch[text_col],
                          batch[id_col].to_numpy(np.int64), ray.get(tref))
        return out.rename(columns={"doc_id": id_col})

    rows = pin_or_spill(
        docs.map_batches(match, batch_format="pandas", batch_size=None),
        spill_dir, "keyword_match_rows")

    # df + N fold on the driver: match rows per term per batch collapse
    # to ≤ n_blocks × (|terms|+1) partial rows through this aggregation
    def df_partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("term", sort=False)
        return g.agg(docs=(id_col, "size"),
                     n=("tf", "sum")).reset_index()

    dfp = rows.map_batches(df_partial, batch_format="pandas",
                           batch_size=None).to_pandas()
    n_docs = int(dfp.loc[dfp["term"] == _N_SENTINEL, "n"].sum())
    df_map = (dfp[dfp["term"] != _N_SENTINEL]
              .groupby("term", sort=False)["docs"].sum())
    if not len(df_map) or n_docs == 0:
        return ray.data.from_pandas(pd.DataFrame(
            {id_col: pd.Series(dtype="int64"),
             "score": pd.Series(dtype="int64")}))
    idf = {t: (n_docs * idf_scale) // int(d) for t, d in df_map.items()}
    iref = ray.put(idf)

    def weigh(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["term"] != _N_SENTINEL]
        w = b["term"].map(ray.get(iref)).to_numpy(np.int64)
        return pd.DataFrame({id_col: b[id_col].to_numpy(),
                             "score": b["tf"].to_numpy(np.int64) * w})

    # (doc, score) totals via ONE doc-bucketed sum — a doc's match rows
    # may straddle block boundaries after a spill re-read, so per-batch
    # top-k partials alone could under-count a split doc; post-sum each
    # block emits only its top-k and the driver merges k·n_blocks rows
    from zeeklog_ray.relational import grouped_sum_bucketed

    totals = grouped_sum_bucketed(
        rows.map_batches(weigh, batch_format="pandas", batch_size=None),
        [id_col], sums={"score": "score"})

    def topk_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(["score", id_col],
                                 ascending=[False, True]).head(k)

    top = totals.map_batches(topk_partial, batch_format="pandas",
                             batch_size=None).to_pandas()
    if not len(top):
        return ray.data.from_pandas(pd.DataFrame(
            {id_col: pd.Series(dtype="int64"),
             "score": pd.Series(dtype="int64")}))
    top = top.sort_values(["score", id_col],
                          ascending=[False, True]).head(k) \
        .reset_index(drop=True)
    return ray.data.from_pandas(top.astype({id_col: "int64",
                                            "score": "int64"}))
