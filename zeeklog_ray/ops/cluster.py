"""Distributed k-means over an embedding column — the iterative-algorithm
representative: every Lloyd iteration is ONE streaming pass of per-batch
partial statistics (k×dim sums + counts + SSE, a few KB per batch) with the
centroid matrix broadcast via ``ray.put``; the driver reduces the tiny
partials and re-broadcasts.  Vectors never shuffle and never land on the
driver.

Relationship to :func:`zeeklog_ray.ops.similarity.ivf_build_centroids`: IVF
fits on a driver-side SAMPLE (cheap, good enough for coarse quantization);
this module refines over the FULL dataset — what you run when cluster
quality is the product (topic clustering, dedup blocking, data maps).

Scale notes: the input is materialized once after column pruning (at 100 TB
persist the projected (id, vector) table to Parquet instead and re-read per
iteration — the pass structure is identical); partial size is
O(k·dim·n_batches) independent of row count; ``kmeans_assign`` is a
row-local map usable as a blocking column for downstream partitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from zeeklog_ray.ops.similarity import _matrix


def _maxmin_init(sample: np.ndarray, k: int, seed: int) -> np.ndarray:
    """Deterministic farthest-point init (Euclidean): uniform init often
    drops two seeds in one true cluster; greedy maxmin covers separated
    clusters (same policy as the IVF coarse quantizer, cosine→L2)."""
    rng = np.random.default_rng(seed)
    first = int(rng.integers(0, len(sample)))
    chosen = [first]
    d2 = ((sample - sample[first]) ** 2).sum(axis=1)
    for _ in range(1, min(k, len(sample))):
        nxt = int(np.argmax(d2))
        chosen.append(nxt)
        d2 = np.minimum(d2, ((sample - sample[nxt]) ** 2).sum(axis=1))
    return sample[chosen].copy()


def kmeans_fit(ds: "ray.data.Dataset", k: int = 8, n_iters: int = 10,
               vec_col: str = "embedding", sample_n: int = 4096,
               tol: float = 1e-7, seed: int = 42) -> dict:
    """Lloyd's algorithm, full-data.  Returns ``{"centroids": (k, dim)
    float64, "inertia": float, "history": [sse per pass], "n_iters":
    int (update rounds performed), "n_rows": int}``.

    Each pass maps the dataset once: per batch, assign rows to the
    nearest centroid (one ``(batch × dim) @ (dim × k)`` matmul via the
    ``|x-c|² = |x|² - 2x·c + |c|²`` expansion) and emit the per-cluster
    vector sums / counts / SSE as ONE partial row.  Driver reduce is
    O(k·dim·n_batches).  Empty clusters keep their previous centroid
    (deterministic; they can re-acquire points later).  Stops early when
    the relative SSE improvement falls under ``tol`` — SSE is
    non-increasing under Lloyd, which the tests assert.

    ``inertia`` (== ``history[-1]``) is always the SSE of the RETURNED
    centroid matrix under its own assignment: the loop measures before
    it updates and never updates after the final measured pass, so
    ``n_iters`` update rounds cost ``n_iters + 1`` passes.
    """
    proj = ds.select_columns([vec_col]).materialize()
    n_rows = proj.count()
    if n_rows == 0:
        raise ValueError("kmeans_fit: empty input")
    k = min(k, n_rows)

    frac = min(1.0, 1.25 * sample_n / n_rows)
    sample = proj.random_sample(frac, seed=seed).to_pandas()
    if len(sample) < k:   # tiny inputs / unlucky draw: take a prefix big
        sample = proj.limit(max(sample_n, k)).to_pandas()   # enough for k
    mat = np.stack(list(sample[vec_col].to_numpy())).astype(np.float64)
    cents = _maxmin_init(mat, k, seed)
    k = len(cents)                      # the sample bounds the seed count
    dim = cents.shape[1]

    history: list[float] = []
    updates = 0
    for it in range(n_iters + 1):
        cref = ray.put(cents)

        def partial(batch: pa.Table, cref=cref) -> pd.DataFrame:
            c = ray.get(cref)
            x = _matrix(batch[vec_col])
            # |x-c|^2 = |x|^2 - 2 x·c + |c|^2; argmin over clusters
            xc = x @ c.T
            d2 = (x * x).sum(axis=1)[:, None] - 2 * xc + \
                (c * c).sum(axis=1)[None, :]
            a = np.argmin(d2, axis=1)
            sums = np.zeros((len(c), x.shape[1]))
            np.add.at(sums, a, x)
            counts = np.bincount(a, minlength=len(c)).astype(np.int64)
            sse = float(np.maximum(d2[np.arange(len(x)), a], 0.0).sum())
            return pd.DataFrame({"sums": [sums.tobytes()],
                                 "counts": [counts.tobytes()],
                                 "sse": [sse]})

        parts = proj.map_batches(partial, batch_format="pyarrow",
                                 batch_size=None).to_pandas()
        sums = np.zeros((k, dim))
        counts = np.zeros(k, dtype=np.int64)
        for b in parts["sums"]:
            sums += np.frombuffer(b, dtype=np.float64).reshape(k, dim)
        for b in parts["counts"]:
            counts += np.frombuffer(b, dtype=np.int64)
        sse = float(parts["sse"].sum())
        history.append(sse)

        converged = (len(history) >= 2 and history[-2] > 0 and
                     (history[-2] - history[-1]) / history[-2] < tol)
        if converged or it == n_iters:
            break           # cents stays the matrix this SSE measured
        nonempty = counts > 0
        new = cents.copy()
        new[nonempty] = sums[nonempty] / counts[nonempty, None]
        cents = new
        updates += 1

    return {"centroids": cents, "inertia": history[-1],
            "history": history, "n_iters": updates, "n_rows": n_rows}


def kmeans_assign(ds: "ray.data.Dataset", centroids: np.ndarray,
                  vec_col: str = "embedding",
                  id_col: str = "vec_id") -> "ray.data.Dataset":
    """Row-local assignment pass: ``(id_col, cluster, dist2_e6)`` with the
    squared Euclidean distance floored at 1e-6 fixed point (the repo's
    float policy).  The centroid matrix broadcasts once via ``ray.put``."""
    cref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        x = _matrix(batch[vec_col])
        d2 = (x * x).sum(axis=1)[:, None] - 2 * (x @ c.T) + \
            (c * c).sum(axis=1)[None, :]
        a = np.argmin(d2, axis=1)
        best = np.maximum(d2[np.arange(len(x)), a], 0.0)
        return pa.table({
            id_col: batch[id_col],
            "cluster": pa.array(a.astype(np.int64), pa.int64()),
            "dist2_e6": pa.array(np.floor(best * 1e6).astype(np.int64),
                                 pa.int64()),
        })

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=None)
