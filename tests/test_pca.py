"""Distributed PCA fit/project vs a gathered numpy reference."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def _emb_ds(x: np.ndarray, blocks: int = 6):
    df = pd.DataFrame({"embedding": [row.tolist() for row in x]})
    return rd.from_pandas(df).repartition(blocks)


def _ref_pca(x: np.ndarray, k: int):
    mean = x.mean(axis=0)
    cov = np.cov(x.T, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    return mean, evecs[:, order].T, evals[order]


def test_fit_pca_matches_gathered_reference():
    from cdm_data_loader_utils_ray.functions.pca import fit_pca

    rng = np.random.default_rng(11)
    # anisotropic cloud: distinct eigenvalues so components are unique
    base = rng.normal(size=(800, 6)) * np.array([5.0, 3.0, 2.0, 1.0, 0.5, 0.1])
    rot, _ = np.linalg.qr(rng.normal(size=(6, 6)))
    x = base @ rot + rng.normal(size=6)
    mean, comp, var = fit_pca(_emb_ds(x), n_components=3, batch_size=64)
    rmean, rcomp, rvar = _ref_pca(x, 3)
    np.testing.assert_allclose(mean, rmean, atol=1e-9)
    np.testing.assert_allclose(var, rvar, rtol=1e-8)
    for i in range(3):  # eigenvectors match up to sign
        dot = abs(float(np.dot(comp[i], rcomp[i])))
        assert dot == pytest.approx(1.0, abs=1e-8)
        # and the sign convention makes the largest |loading| positive
        assert comp[i][np.abs(comp[i]).argmax()] > 0


def test_project_pca_and_whitening_variance():
    from cdm_data_loader_utils_ray.functions.pca import fit_pca, project_pca

    rng = np.random.default_rng(5)
    x = rng.normal(size=(600, 5)) * np.array([4.0, 2.0, 1.0, 0.5, 0.25])
    ds = _emb_ds(x)
    mean, comp, var = fit_pca(ds, n_components=2, whiten=True, batch_size=50)
    out = project_pca(ds, mean, comp, output_column="pca").to_pandas()
    p = np.array(out["pca"].tolist())
    assert p.shape == (600, 2)
    # whitened coordinates: ~unit variance, near-zero mean, decorrelated
    np.testing.assert_allclose(p.mean(axis=0), 0.0, atol=1e-9)
    np.testing.assert_allclose(p.var(axis=0), 1.0, rtol=1e-6)
    assert abs(float(np.corrcoef(p.T)[0, 1])) < 1e-6


def test_fit_pca_rejects_empty_and_ragged():
    from cdm_data_loader_utils_ray.functions.pca import fit_pca

    with pytest.raises(ValueError, match="empty"):
        fit_pca(_emb_ds(np.zeros((0, 3)) if False else np.empty((0, 3)), blocks=1))
    df = pd.DataFrame({"embedding": [[1.0, 2.0], [1.0]]})
    with pytest.raises(Exception):
        fit_pca(rd.from_pandas(df))
