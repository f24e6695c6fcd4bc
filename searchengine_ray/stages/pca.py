"""Distributed PCA: covariance from ONE corpus pass, map-only projection.

The dimensionality-reduction step of an embedding curation pipeline
(SemDeDup/DataComp whiten-and-project, LSA over tf-idf, visualization):
project each vector onto the top-m principal components of the corpus.

Ray-Data shape (the algebraic-aggregate discipline of ``q_user_trend``
scaled from 5 moments to d·(d+2)):

- ``pca_fit``: one ``map_batches`` pass emits, per batch, d partial rows
  — row i carries Σ x_i·x_j for all j (one d×d Gram matmul per batch),
  Σ x_i, and the batch count (carried on row 0 only, the k-means
  signature trick) — reduced by ``pre_aggregate`` keyed on i (or on the
  driver below the size threshold, the same routing as
  ``kmeans_fit_traced``).  The driver ever holds d×(d+2) scalars: the
  exact covariance C = G/n − μμᵀ of the FULL corpus, never a sample.
  Eigendecomposition of the d×d C is O(d³) driver work — microseconds
  at d ≤ 4096, independent of corpus size.
- ``pca_project``: components broadcast once via ``ray.put``; each batch
  is one (b×d)·(d×m) matmul minus the precomputed μ·Vᵀ row — map-only,
  zero shuffles at any corpus size.

Determinism: like ``kmeans_fit``, the partial-sum reduction order varies
with parallelism, so C (and the eigenvectors) are float-stable only up
to reduction order.  Callers that gate results persist the fitted
components (``q_pca_project`` writes the scratch table its SQL oracle
reads), so engine and oracle always see the same basis within a run.
Component SIGN is fixed deterministically (the largest-|entry| is made
positive) so the basis is stable given identical moments.

No counterpart exists in the reference (its vectors never leave tf-idf
space); the operator follows the standard eigendecomposition PCA
(Pearson 1901 / Hotelling 1933) on exact corpus moments.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
from ray.data import Dataset

import pyarrow as pa

from searchengine_ray.stages.kmeans import (
    DRIVER_REDUCE_MAX_ROWS, _emb_matrix_ws, _ws)
from searchengine_ray.stages.relational import pre_aggregate


def pca_fit(
    ds: Dataset, emb_col: str = "embedding", n_components: int = 8,
    batch_size: int = 65536,
    driver_reduce_max_rows: int = DRIVER_REDUCE_MAX_ROWS,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Fit on the FULL corpus; returns (mean d, components m×d,
    eigenvalues m descending, n_rows).

    Per batch: G += XᵀX (one BLAS call), s += Σx, n += b — emitted as d
    rows (i, g0..g{d-1}, sx, n) and sum-reduced.  C is symmetrized
    before ``eigh`` (the two partial triangles differ only in ulps).
    Components are rows of Vᵀ, eigenvalue-descending, each sign-fixed so
    its largest-magnitude entry (first, on ties) is positive."""
    n_rows = ds.count()
    if n_rows == 0:
        raise ValueError("pca_fit: empty dataset")
    first = ds.take_batch(1, batch_format="pyarrow")
    d = len(first[emb_col][0])
    if not 1 <= n_components <= d:
        raise ValueError(f"pca_fit: n_components {n_components} not in [1, {d}]")
    gcols = [f"g{j}" for j in range(d)]

    def moments(t: pa.Table) -> pd.DataFrame:
        if not t.num_rows:
            e = {"i": np.zeros(0, np.int64)}
            e.update({g: np.zeros(0, np.float64) for g in gcols})
            e.update({"sx": np.zeros(0, np.float64),
                      "n": np.zeros(0, np.float64)})
            return pd.DataFrame(e)
        emb = _emb_matrix_ws(t[emb_col], "pca_emb")
        gram = _ws("pca_gram", (d, d))
        np.matmul(emb.T, emb, out=gram)
        out = {"i": np.arange(d, dtype=np.int64)}
        for j in range(d):
            out[gcols[j]] = gram[:, j].copy()
        out["sx"] = emb.sum(0)
        n = np.zeros(d, dtype=np.float64)
        n[0] = float(emb.shape[0])  # batch count carried on row 0 only
        out["n"] = n
        return pd.DataFrame(out)

    partials = ds.map_batches(moments, batch_format="pyarrow",
                              batch_size=batch_size)
    if n_rows <= driver_reduce_max_rows:
        # ≤ ceil(n/batch) × d rows — bounded by the route threshold
        agg = (partials.to_pandas()
               .groupby("i", as_index=False).sum().sort_values("i"))
    else:
        specs: dict = {g: (g, "sum") for g in gcols}
        specs.update({"sx": ("sx", "sum"), "n": ("n", "sum")})
        agg = (pre_aggregate(partials, ["i"], specs)
               .to_pandas().sort_values("i"))

    gram = np.zeros((d, d), dtype=np.float64)
    gram[agg["i"].to_numpy(np.int64), :] = agg[gcols].to_numpy(np.float64)
    s = np.zeros(d, dtype=np.float64)
    s[agg["i"].to_numpy(np.int64)] = agg["sx"].to_numpy(np.float64)
    n = float(agg["n"].sum())
    mean = s / n
    cov = gram / n - np.outer(mean, mean)
    cov = (cov + cov.T) * 0.5
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals, kind="stable")[::-1][:n_components]
    comp = evecs[:, order].T.copy()  # m×d
    evals = evals[order].copy()
    # deterministic sign: the largest-|entry| (first on ties) positive
    for r in range(comp.shape[0]):
        j = int(np.argmax(np.abs(comp[r])))
        if comp[r, j] < 0:
            comp[r] = -comp[r]
    return mean, comp, evals, int(n)


def pca_project(
    ds: Dataset, mean: np.ndarray, components: np.ndarray,
    id_col: str = "vec_id", emb_col: str = "embedding",
    round_to: int = 6, batch_size: int = 65536,
) -> Dataset:
    """Map-only projection: p = x·vᵣ − μ·vᵣ per component r, rounded.

    Output columns (id_col, p0..p{m-1}).  μ·vᵣ is precomputed ONCE on
    the driver and subtracted from the per-row raw dot — the exact
    decomposition a SQL oracle computes from a persisted
    (component, mu_dot) table, so only sub-ulp inner-product association
    separates engine and oracle (absorbed by ``round_to``)."""
    comp = np.asarray(components, dtype=np.float64)
    mu_dot = np.asarray(mean, dtype=np.float64) @ comp.T  # (m,)
    comp_ref = ray.put(comp)
    m = comp.shape[0]
    pcols = [f"p{r}" for r in range(m)]

    def project(t: pa.Table) -> pd.DataFrame:
        if not t.num_rows:
            e = {id_col: np.zeros(0, np.int64)}
            e.update({p: np.zeros(0, np.float64) for p in pcols})
            return pd.DataFrame(e)
        v = ray.get(comp_ref)  # plasma-local, zero-copy
        emb = _emb_matrix_ws(t[emb_col], "pca_proj_emb")
        raw = _ws("pca_proj_raw", (emb.shape[0], m))
        np.matmul(emb, v.T, out=raw)
        raw -= mu_dot[None, :]
        np.round(raw, round_to, out=raw)
        out = {id_col: t[id_col].to_numpy().astype(np.int64, copy=False)}
        for r in range(m):
            out[pcols[r]] = raw[:, r].copy()
        return pd.DataFrame(out)

    return ds.map_batches(project, batch_format="pyarrow",
                          batch_size=batch_size)
