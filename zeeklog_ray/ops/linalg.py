"""Distributed dense linear algebra over embedding columns: exact integer
Gram matrix and PCA (covariance → eigh → projection).

The scale shape for both is the **fixed-size-partial** pattern: every batch
reduces its (rows × d) slab to a d×d partial (int64 or float64), so the
exchange is |batches| × d² values regardless of input size — the dense
analog of the mergeable-sketch exchange in :mod:`zeeklog_ray.ops.sketch`.
At d=16 a partial is 2 KB; even d=1024 is 8 MB/batch, still far below
block size.  The eigendecomposition runs once on the driver on the d×d
covariance (d ≪ rows always, by construction of an embedding column), and
the projection pass is row-local — vectors never shuffle.

Reference parity note: the reference engine (a Rust Zeek log library) has
no linear algebra; this module belongs to the training-data-pipeline
surface (SURVEY.md §2: embedding ops — dedup/ANN/quantize/cluster), where
PCA whitening / dimensionality reduction precedes ANN indexing at corpus
scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from zeeklog_ray.ops.similarity import _matrix


def gram_int8(ds: "ray.data.Dataset", id_col: str = "vec_id",
              emb_col: str = "embedding") -> "ray.data.Dataset":
    """EXACT upper-triangular Gram matrix of the int8-quantized embedding
    table: ``g[i,j] = Σ_rows q_i · q_j`` (i ≤ j), all math int64.

    Pipeline: :func:`~zeeklog_ray.ops.similarity.quantize_embeddings`
    (row-local, bit-exact DuckDB replay) → per-batch ``MᵀM`` partial
    (ONE int64 matmul per batch, d(d+1)/2 rows emitted) → combiner-first
    ``grouped_sum`` on (i, j).  Quantizing first keeps the sums exact —
    int8 products can't lose precision in int64 — so the whole statistic
    is hash-comparable against SQL, unlike float dot products whose value
    depends on summation order.  Output: ``(i, j, g)``.
    """
    from zeeklog_ray.ops.similarity import quantize_embeddings
    from zeeklog_ray.relational import grouped_sum

    q = quantize_embeddings(ds.select_columns([id_col, emb_col]),
                            id_col=id_col, emb_col=emb_col)

    def partial(batch: pa.Table) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({"i": pd.Series([], dtype="int64"),
                                 "j": pd.Series([], dtype="int64"),
                                 "g": pd.Series([], dtype="int64")})
        m = _matrix(batch["q"]).astype(np.int64)
        g = m.T @ m                                   # (d, d) exact int64
        iu, ju = np.triu_indices(g.shape[0])
        return pd.DataFrame({"i": iu.astype(np.int64),
                             "j": ju.astype(np.int64),
                             "g": g[iu, ju]})

    parts = q.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return grouped_sum(parts, ["i", "j"], sums={"g": "g"})


def _sign_fix(components: np.ndarray) -> np.ndarray:
    """Deterministic sign convention: the largest-|x| element of each
    component is positive (eigh's sign is arbitrary and varies across
    LAPACK builds — pin it so fits are comparable across nodes/runs)."""
    idx = np.argmax(np.abs(components), axis=1)
    signs = np.sign(components[np.arange(len(components)), idx])
    signs[signs == 0] = 1.0
    return components * signs[:, None]


def pca_fit(ds: "ray.data.Dataset", emb_col: str = "embedding",
            k: int = 4) -> dict:
    """Fit PCA over an embedding column in one streaming pass.

    Each batch emits one row carrying ``(n, Σx, ΣxᵀX)`` as float64 bytes
    (the fixed-size partial); the driver sums them, forms the sample
    covariance ``(ΣxᵀX − n·x̄x̄ᵀ)/(n−1)``, and runs ``eigh`` on the d×d
    matrix.  Returns ``{"n", "mean" (d,), "components" (k, d) — rows are
    descending-eigenvalue, sign-fixed, "explained_var" (k,)}``.

    Float partials sum in block order, so the last ~1 ulp of the
    covariance can differ across block splits — inherent to any
    distributed float reduction; the pytest gate compares against a
    single-pass numpy fit with ``allclose``, and downstream consumers
    (projection, whitening) are insensitive at that scale.
    """

    def partial(batch: pa.Table) -> pd.DataFrame:
        if len(batch) == 0:
            # _matrix can't infer dim from zero rows; the driver filters
            # n == 0 partials before frombuffer
            return pd.DataFrame({"n": [np.int64(0)], "s": [b""],
                                 "g": [b""]})
        m = _matrix(batch[emb_col])
        return pd.DataFrame({
            "n": [np.int64(m.shape[0])],
            "s": [m.sum(axis=0).tobytes()],
            "g": [(m.T @ m).tobytes()],
        })

    parts = ds.select_columns([emb_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None).to_pandas()
    parts = parts[parts["n"] > 0]
    if parts.empty:
        raise ValueError("pca_fit: empty dataset")
    n = int(parts["n"].sum())
    s = np.sum([np.frombuffer(b, dtype=np.float64) for b in parts["s"]],
               axis=0)
    d = len(s)
    g = np.sum([np.frombuffer(b, dtype=np.float64).reshape(d, d)
                for b in parts["g"]], axis=0)
    if n < 2:
        raise ValueError("pca_fit: need at least 2 rows")
    if k > d:
        raise ValueError(f"pca_fit: k={k} exceeds embedding dim {d}")
    mean = s / n
    cov = (g - n * np.outer(mean, mean)) / (n - 1)
    eigvals, eigvecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(eigvals)[::-1][:k]
    components = _sign_fix(eigvecs[:, order].T)
    return {"n": n, "mean": mean, "components": components,
            "explained_var": eigvals[order]}


def pca_project(ds: "ray.data.Dataset", fit: dict,
                id_col: str = "vec_id",
                emb_col: str = "embedding") -> "ray.data.Dataset":
    """Row-local projection onto the fitted components: ``(x − x̄) @ Wᵀ``.
    The (small) fit travels once via ``ray.put`` and each batch does one
    matmul — no shuffle, no per-row Python.  Output:
    ``(id_col, proj: list<double>)`` with ``len(proj) == k``."""
    ref = ray.put((np.asarray(fit["mean"], dtype=np.float64),
                   np.asarray(fit["components"], dtype=np.float64)))

    def project(batch: pa.Table) -> pa.Table:
        mean, comps = ray.get(ref)
        # length check BEFORE _matrix — it raises on a zero-row list column
        m = _matrix(batch[emb_col]) if len(batch) else \
            np.empty((0, len(mean)))
        proj = (m - mean) @ comps.T
        k = comps.shape[0]
        offs = pa.array(np.arange(len(m) + 1, dtype=np.int32) * k)
        return pa.table({
            id_col: batch[id_col],
            "proj": pa.ListArray.from_arrays(
                offs, pa.array(proj.ravel(), pa.float64())),
        })

    return ds.select_columns([id_col, emb_col]).map_batches(
        project, batch_format="pyarrow", batch_size=None)
