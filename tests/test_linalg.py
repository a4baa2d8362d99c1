"""Distributed linear algebra (ops/linalg): exact int8 Gram matrix and
PCA fit/project parity against single-pass numpy."""

import numpy as np
import pandas as pd
import pytest

import ray.data


def _emb_frame(n=200, d=8, seed=11):
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, d)) * rng.uniform(0.5, 3.0, size=d)
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [row.astype(np.float32) for row in mat],
    }), mat.astype(np.float32).astype(np.float64)


def _quantize_ref(mat: np.ndarray) -> np.ndarray:
    """The quantize formula, single-pass numpy — the in-test oracle."""
    scale = np.abs(mat).max(axis=1, keepdims=True)
    with np.errstate(invalid="ignore", divide="ignore"):
        q = np.floor(mat / scale * 127.0 + 0.5)
    q[np.broadcast_to(scale == 0, q.shape)] = 0.0
    return q.astype(np.int64)


def _ds(df, blocks=5):
    return ray.data.from_pandas(df, override_num_blocks=blocks)


# ---- gram_int8 ----------------------------------------------------------


def test_gram_matches_numpy_exactly(ray_session):
    from zeeklog_ray.ops.linalg import gram_int8

    df, mat = _emb_frame()
    got = gram_int8(_ds(df)).to_pandas() \
        .sort_values(["i", "j"]).reset_index(drop=True)
    q = _quantize_ref(mat)
    g = q.T @ q
    iu, ju = np.triu_indices(g.shape[0])
    assert len(got) == len(iu)
    assert np.array_equal(got["i"].to_numpy(), iu)
    assert np.array_equal(got["j"].to_numpy(), ju)
    assert np.array_equal(got["g"].to_numpy(), g[iu, ju])


def test_gram_block_split_invariant(ray_session):
    """Integer partials: the result is bit-identical at any block count."""
    from zeeklog_ray.ops.linalg import gram_int8

    df, _ = _emb_frame(n=60, d=4, seed=3)
    a = gram_int8(_ds(df, blocks=1)).to_pandas().sort_values(["i", "j"])
    b = gram_int8(_ds(df, blocks=12)).to_pandas().sort_values(["i", "j"])
    assert np.array_equal(a["g"].to_numpy(), b["g"].to_numpy())


def test_gram_all_zero_vectors(ray_session):
    from zeeklog_ray.ops.linalg import gram_int8

    df = pd.DataFrame({
        "vec_id": [0, 1],
        "embedding": [np.zeros(3, np.float32), np.zeros(3, np.float32)]})
    got = gram_int8(_ds(df, blocks=1)).to_pandas()
    assert (got["g"] == 0).all() and len(got) == 6


# ---- pca_fit / pca_project ----------------------------------------------


def test_pca_fit_matches_single_pass_numpy(ray_session):
    from zeeklog_ray.ops.linalg import _sign_fix, pca_fit

    df, mat = _emb_frame(n=300, d=8, seed=7)
    fit = pca_fit(_ds(df), k=8)
    assert fit["n"] == 300
    np.testing.assert_allclose(fit["mean"], mat.mean(axis=0), rtol=1e-10)
    cov = np.cov(mat, rowvar=False)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    np.testing.assert_allclose(fit["explained_var"], w[order], rtol=1e-8)
    np.testing.assert_allclose(fit["components"], _sign_fix(v[:, order].T),
                               atol=1e-8)


def test_pca_project_reconstructs_with_full_rank(ray_session):
    """k=d projection is a rotation: X̂ = proj @ W + mean recovers X."""
    from zeeklog_ray.ops.linalg import pca_fit, pca_project

    df, mat = _emb_frame(n=120, d=6, seed=9)
    fit = pca_fit(_ds(df), k=6)
    got = pca_project(_ds(df), fit).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    proj = np.stack(got["proj"].to_numpy())
    recon = proj @ fit["components"] + fit["mean"]
    np.testing.assert_allclose(recon, mat, atol=1e-8)
    # and the projection is actually decorrelated (diagonal covariance)
    pcov = np.cov(proj, rowvar=False)
    off = pcov - np.diag(np.diag(pcov))
    assert np.abs(off).max() < 1e-8


def test_pca_topk_projection_variance_is_sorted(ray_session):
    from zeeklog_ray.ops.linalg import pca_fit, pca_project

    df, _ = _emb_frame(n=250, d=8, seed=5)
    fit = pca_fit(_ds(df), k=3)
    got = pca_project(_ds(df), fit).to_pandas()
    proj = np.stack(got["proj"].to_numpy())
    assert proj.shape == (250, 3)
    var = proj.var(axis=0, ddof=1)
    assert var[0] >= var[1] >= var[2]
    np.testing.assert_allclose(var, fit["explained_var"], rtol=1e-6)


def test_pca_fit_input_validation(ray_session):
    from zeeklog_ray.ops.linalg import pca_fit

    df, _ = _emb_frame(n=4, d=3)
    with pytest.raises(ValueError, match="k=5 exceeds"):
        pca_fit(_ds(df, blocks=1), k=5)
    one = df.iloc[:1]
    with pytest.raises(ValueError, match="at least 2 rows"):
        pca_fit(_ds(one, blocks=1), k=2)


def test_pca_fit_sign_deterministic_across_block_splits(ray_session):
    from zeeklog_ray.ops.linalg import pca_fit

    df, _ = _emb_frame(n=150, d=5, seed=13)
    a = pca_fit(_ds(df, blocks=1), k=5)
    b = pca_fit(_ds(df, blocks=10), k=5)
    np.testing.assert_allclose(a["components"], b["components"], atol=1e-9)


def test_pca_survives_empty_blocks(ray_session):
    """An upstream filter that empties a whole block must not crash the
    partial pass (the _matrix reshape raises on zero-row list columns)."""
    from zeeklog_ray.ops.linalg import pca_fit, pca_project

    df, mat = _emb_frame(n=80, d=4, seed=17)
    ds = ray.data.from_pandas(df, override_num_blocks=4).map_batches(
        lambda b: b[b["vec_id"] >= 40], batch_format="pandas",
        batch_size=None)
    fit = pca_fit(ds, k=2)
    assert fit["n"] == 40
    np.testing.assert_allclose(fit["mean"], mat[40:].mean(axis=0),
                               rtol=1e-10)
    got = pca_project(ds, fit).to_pandas()
    assert len(got) == 40
