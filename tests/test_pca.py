"""PCA fit/project vs an exact numpy reference (stages/pca.py)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from searchengine_ray.stages import pca


def _make_ds(x: np.ndarray, nblocks: int = 3):
    df = pd.DataFrame({
        "vec_id": np.arange(len(x), dtype=np.int64),
        "embedding": [row.astype(np.float32).tolist() for row in x]})
    return rd.from_pandas(df).repartition(nblocks)


def _ref_fit(x: np.ndarray, m: int):
    x = x.astype(np.float32).astype(np.float64)  # the engine's cast path
    n = len(x)
    mean = x.sum(0) / n
    cov = (x.T @ x) / n - np.outer(mean, mean)
    cov = (cov + cov.T) * 0.5
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals, kind="stable")[::-1][:m]
    comp = evecs[:, order].T.copy()
    for r in range(m):
        j = int(np.argmax(np.abs(comp[r])))
        if comp[r, j] < 0:
            comp[r] = -comp[r]
    return mean, comp, evals[order]


def test_fit_matches_reference(ray_session):
    rng = np.random.default_rng(7)
    x = rng.normal(size=(400, 12)) * rng.uniform(0.2, 3.0, size=12)
    mean, comp, evals, n = pca.pca_fit(_make_ds(x), n_components=5)
    rmean, rcomp, revals = _ref_fit(x, 5)
    assert n == 400
    np.testing.assert_allclose(mean, rmean, atol=1e-10)
    np.testing.assert_allclose(evals, revals, atol=1e-9)
    # eigenvectors match up to reduction-order ulps (same sign rule)
    for r in range(5):
        assert abs(float(comp[r] @ rcomp[r])) > 1 - 1e-9
        np.testing.assert_allclose(comp[r], rcomp[r], atol=1e-6)


def test_components_orthonormal_and_evals_descending(ray_session):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(300, 10))
    _, comp, evals, _ = pca.pca_fit(_make_ds(x), n_components=6)
    np.testing.assert_allclose(comp @ comp.T, np.eye(6), atol=1e-9)
    assert (np.diff(evals) <= 1e-12).all()


def test_planted_subspace_recovered(ray_session):
    # data = strong 2-D plane + tiny isotropic noise: the top-2 basis
    # must span the plane (projector distance ~ noise scale)
    rng = np.random.default_rng(11)
    b1 = np.zeros(16); b1[2] = 1.0
    b2 = np.zeros(16); b2[9] = 1.0
    coef = rng.normal(size=(500, 2)) * [5.0, 3.0]
    x = coef @ np.stack([b1, b2]) + rng.normal(size=(500, 16)) * 0.01
    _, comp, evals, _ = pca.pca_fit(_make_ds(x), n_components=2)
    proj = comp.T @ comp  # projector onto the fitted 2-D basis
    true = np.outer(b1, b1) + np.outer(b2, b2)
    assert np.abs(proj - true).max() < 1e-3
    assert evals[0] > evals[1] > 1.0  # the planted 5² > 3² variances


def test_project_matches_driver_recompute(ray_session):
    rng = np.random.default_rng(5)
    x = rng.normal(size=(200, 8))
    ds = _make_ds(x)
    mean, comp, _, _ = pca.pca_fit(ds, n_components=3)
    out = (pca.pca_project(ds, mean, comp).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    xf = x.astype(np.float32).astype(np.float64)
    mu_dot = mean @ comp.T
    ref = np.round(xf @ comp.T - mu_dot[None, :], 6)
    got = out[["p0", "p1", "p2"]].to_numpy()
    np.testing.assert_allclose(got, ref, atol=2e-6)
    assert out["vec_id"].tolist() == list(range(200))


def test_sign_rule_deterministic(ray_session):
    # flipping the sign of every input vector's contribution leaves C
    # unchanged; the fitted basis must be identical (sign-fixed)
    rng = np.random.default_rng(9)
    x = rng.normal(size=(150, 6))
    _, c1, _, _ = pca.pca_fit(_make_ds(x, 2), n_components=4)
    _, c2, _, _ = pca.pca_fit(_make_ds(x, 5), n_components=4)
    for r in range(4):
        j = int(np.argmax(np.abs(c1[r])))
        assert c1[r, j] > 0
        np.testing.assert_allclose(c1[r], c2[r], atol=1e-7)


def test_n_components_bounds(ray_session):
    x = np.random.default_rng(1).normal(size=(20, 4))
    with pytest.raises(ValueError):
        pca.pca_fit(_make_ds(x), n_components=5)
    with pytest.raises(ValueError):
        pca.pca_fit(_make_ds(x), n_components=0)
