"""Similarity search over an embedding column.

- ``knn_bruteforce``: exact cosine top-k — one numpy matmul per batch
  against a broadcast query matrix, per-batch local top-k, tiny global
  merge.  The all-data path never leaves the batch tasks; only k rows per
  batch reach the driver-side merge.
- ``knn_ivf``: IVF-style scale path — k-means-lite coarse centroids
  (sampled, deterministic), per-batch assignment to nearest centroid,
  probe the ``nprobe`` closest centroid buckets only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
from ray.data import Dataset


def _batch_topk(emb: np.ndarray, ids: np.ndarray, q: np.ndarray, k: int) -> pd.DataFrame:
    norms = np.linalg.norm(emb, axis=1) * np.linalg.norm(q)
    norms[norms == 0] = 1.0
    sims = emb @ q / norms
    k_eff = min(k, sims.shape[0])
    idx = np.argpartition(-sims, k_eff - 1)[:k_eff]
    return pd.DataFrame({"vec_id": ids[idx], "cosine": sims[idx]})


def knn_bruteforce(
    ds: Dataset, query: np.ndarray, k: int = 10,
    id_col: str = "vec_id", emb_col: str = "embedding",
    exclude_ids: set | None = None,
) -> pd.DataFrame:
    """Exact top-k by cosine; returns (vec_id, cosine) sorted desc with
    vec_id tiebreak."""
    q_ref = ray.put(np.asarray(query, dtype=np.float64))
    excl = exclude_ids or set()
    excl_ref = ray.put(excl)

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        qv = ray.get(q_ref)
        ex = ray.get(excl_ref)
        keep = ~df[id_col].isin(ex) if ex else np.ones(len(df), dtype=bool)
        sub = df[keep]
        if not len(sub):
            return pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                                 "cosine": pd.Series([], dtype=np.float64)})
        emb = np.stack([np.asarray(e, dtype=np.float64) for e in sub[emb_col]])
        return _batch_topk(emb, sub[id_col].to_numpy(), qv, k)

    partials = ds.map_batches(local_topk, batch_format="pandas", batch_size=4096).to_pandas()
    out = partials.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
    return out.reset_index(drop=True)


def build_centroids(ds: Dataset, num_centroids: int = 16, sample_frac: float = 0.1,
                    emb_col: str = "embedding", iters: int = 5, seed: int = 5) -> np.ndarray:
    """Deterministic k-means over a sample (driver-side; the sample is small)."""
    sample = ds.random_sample(sample_frac, seed=seed).to_pandas()
    x = np.stack([np.asarray(e, dtype=np.float64) for e in sample[emb_col]])
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(x.shape[0], size=min(num_centroids, x.shape[0]), replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(cent.shape[0]):
            m = assign == c
            if m.any():
                cent[c] = x[m].mean(0)
    return cent


def knn_ivf(
    ds: Dataset, query: np.ndarray, k: int = 10, num_centroids: int = 16,
    nprobe: int = 4, id_col: str = "vec_id", emb_col: str = "embedding",
    exclude_ids: set | None = None, seed: int = 5,
) -> pd.DataFrame:
    """IVF-bucketed ANN: assign rows to nearest centroid inside map_batches,
    keep only rows in the ``nprobe`` centroids closest to the query, then
    exact top-k on the survivors.  At scale the assignment would be a
    persisted partitioning (write once, probe many)."""
    cent = build_centroids(ds, num_centroids, emb_col=emb_col, seed=seed)
    q = np.asarray(query, dtype=np.float64)
    probe = set(np.argsort(((cent - q) ** 2).sum(1))[:nprobe].tolist())
    cent_ref = ray.put(cent)
    probe_ref = ray.put(probe)

    def probe_filter(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cent_ref)
        p = ray.get(probe_ref)
        emb = np.stack([np.asarray(e, dtype=np.float64) for e in df[emb_col]])
        d = ((emb[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        mask = np.isin(d.argmin(1), list(p))
        return df[mask]

    survivors = ds.map_batches(probe_filter, batch_format="pandas", batch_size=4096)
    return knn_bruteforce(survivors, q, k, id_col, emb_col, exclude_ids)
