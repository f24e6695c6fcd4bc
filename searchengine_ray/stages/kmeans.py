"""Distributed k-means + SemDeDup-style within-cluster semantic near-dup.

Training-data curation pipelines cluster the embedding space and dedup
WITHIN clusters (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication"): k-means partitions the corpus
so the quadratic pair scan runs per cluster (O(k·(n/k)²) = O(n²/k) work,
each cluster independently parallel) instead of over all pairs.  The
reference engine has no embedding operators at all; this module is the
corpus-side Ray-Data shape:

- ``kmeans_fit``: Lloyd's iterations over the FULL corpus.  Init comes
  from the count-capped sampled k-means (``knn.build_centroids`` — the
  driver never holds more than ``max_sample`` vectors); each refinement
  pass assigns per batch with the matmul identity and reduces per-batch
  partial sums through ``pre_aggregate`` — the driver sees ≤ k×(d+1)
  scalar rows per iteration, never corpus rows.  Cost per iteration is
  one corpus read; the centroid table stays O(k·d) everywhere.
- ``kmeans_assign``: one map-batches pass attaching ``cluster_id``.
- ``semantic_dedup_pairs``: per-cluster all-pairs cosine ≥ threshold.
  Clusters co-shuffle whole (``bucketed_map_groups``); inside a cluster
  one normalized Gram matmul serves every pair.  The partitioning
  assumption: cluster size ≈ n/k must fit a worker (SemDeDup runs
  k ≈ 10^4-10^5 at web scale precisely so this holds; a skewed cluster
  should be split by raising k, not chunked here).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
from ray.data import Dataset

from searchengine_ray.stages.knn import _assign_lists, build_centroids
from searchengine_ray.stages.relational import (
    bucketed_map_groups, pre_aggregate)


# Below this corpus row count the per-iteration partials reduce on the
# driver (the pull is ≤ ceil(rows/batch) × k×(d+1) rows — bounded by the
# threshold at ~300k rows for k=32, d=64); above it they reduce through
# `pre_aggregate`.  Same size-routing discipline as `DRIVER_CC_MAX_PAIRS`
# and the crawl resolve: each distributed round is an all-to-all of
# fixed machinery that a small corpus pays in pure latency.
DRIVER_REDUCE_MAX_ROWS = 20_000_000


def kmeans_fit(
    ds: Dataset, num_clusters: int = 8, emb_col: str = "embedding",
    iters: int = 4, seed: int = 5, max_sample: int = 4096,
    tol: float = 1e-9,
    driver_reduce_max_rows: int = DRIVER_REDUCE_MAX_ROWS,
) -> np.ndarray:
    """Centroids (k × d float64) from sampled init + full-corpus Lloyd's.

    Each iteration: per-batch nearest-centroid assignment (matmul
    identity, no n×k×d temporary) → per-batch partial rows
    (cluster, dim, s) where dim==d carries the member count → one
    ``pre_aggregate`` sum → ≤ k×(d+1) rows on the driver → new centroids.
    Empty clusters keep their previous centroid.  Stops early when the
    max centroid shift drops below ``tol`` (the driver already holds both
    centroid tables — the check is free and saves whole corpus passes).

    Determinism: the init is seed-deterministic, but the partial-sum
    reduction order varies with parallelism, so centroids (and borderline
    assignments) are float-stable only up to reduction order — NOT
    guaranteed bit-identical across runs.  Callers needing a stable
    assignment should persist it (``q_semantic_dedup`` writes the scratch
    assignment its oracle reads, so engine and oracle always see the same
    clustering within a run)."""
    n_rows = ds.count()  # parquet-metadata cheap on a column projection
    cent = build_centroids(ds, num_clusters, max_sample, emb_col, seed=seed)
    k, d = cent.shape
    driver_reduce = n_rows <= driver_reduce_max_rows

    for _ in range(iters):
        cent_ref = ray.put(cent)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(cent_ref)  # plasma-local, zero-copy
            emb = np.stack([np.asarray(e, dtype=np.float64)
                            for e in df[emb_col]])
            scores = (c * c).sum(1)[None, :] - 2.0 * (emb @ c.T)
            a = scores.argmin(1)
            sums = np.zeros((k, d), dtype=np.float64)
            np.add.at(sums, a, emb)
            cnt = np.bincount(a, minlength=k).astype(np.float64)
            present = np.nonzero(cnt > 0)[0]
            block = np.hstack([sums[present], cnt[present, None]])  # p×(d+1)
            return pd.DataFrame({
                "c": np.repeat(present, d + 1),
                "dim": np.tile(np.arange(d + 1, dtype=np.int64),
                               present.size),
                "s": block.ravel()})

        partials = ds.map_batches(partial, batch_format="pandas")
        if driver_reduce:
            # ≤ ceil(n/batch) × k×(d+1) rows, bounded by the route threshold
            agg = (partials.to_pandas()
                   .groupby(["c", "dim"], as_index=False)["s"].sum())
        else:
            agg = pre_aggregate(partials, ["c", "dim"],
                                {"s": ("s", "sum")}).to_pandas()  # ≤ k×(d+1)
        stats = np.zeros((k, d + 1), dtype=np.float64)
        stats[agg["c"].to_numpy(np.int64), agg["dim"].to_numpy(np.int64)] = \
            agg["s"].to_numpy(np.float64)
        n = stats[:, d]
        new_cent = cent.copy()
        nz = n > 0
        new_cent[nz] = stats[nz, :d] / n[nz, None]
        shift = float(np.abs(new_cent - cent).max())
        cent = new_cent
        if shift < tol:
            break
    return cent


def kmeans_assign(
    ds: Dataset, centroids: np.ndarray, emb_col: str = "embedding",
    out_col: str = "cluster_id",
) -> Dataset:
    """Attach each row's nearest-centroid id — one map-batches pass, the
    centroid table broadcast once via ``ray.put``."""
    cent_ref = ray.put(np.asarray(centroids, dtype=np.float64))
    assign = _assign_lists(cent_ref, emb_col)

    def with_col(df: pd.DataFrame) -> pd.DataFrame:
        out = assign(df)
        if out_col != "list_id":
            out = out.rename(columns={"list_id": out_col})
        return out

    return ds.map_batches(with_col, batch_format="pandas")


def semantic_dedup_pairs(
    assigned: Dataset, threshold: float,
    id_col: str = "vec_id", emb_col: str = "embedding",
    cluster_col: str = "cluster_id", round_to: int = 6,
    max_cluster_rows: int = 100_000,
) -> Dataset:
    """Within-cluster pairs with cosine ≥ ``threshold``.

    ``assigned`` must carry ``cluster_col`` (from ``kmeans_assign``).
    Clusters co-shuffle whole; per cluster one normalized Gram matrix
    (m×m for m = cluster size ≈ n/k) yields every qualifying pair —
    upper triangle only, ids ordered so id_a < id_b.  Output columns:
    (id_a, id_b, cosine) with cosine rounded to ``round_to``.

    ``max_cluster_rows`` bounds the per-cluster Gram kernel (100k rows ⇒
    a 10^10-cell float64 sim matrix ≈ 80 GB — past any worker heap): a
    cluster over the cap raises with guidance instead of OOM-ing a
    worker.  The fix is a larger k in ``kmeans_fit`` — SemDeDup's own
    scaling knob — not chunking inside the kernel."""

    def cluster_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) > max_cluster_rows:
            raise ValueError(
                f"semantic_dedup_pairs: cluster "
                f"{g[cluster_col].iloc[0]!r} has {len(g)} rows > "
                f"max_cluster_rows={max_cluster_rows}; raise num_clusters "
                f"in kmeans_fit (SemDeDup sizes k so n/k fits a worker) "
                f"or raise max_cluster_rows explicitly")
        empty = pd.DataFrame({
            "id_a": pd.Series([], dtype=np.int64),
            "id_b": pd.Series([], dtype=np.int64),
            "cosine": pd.Series([], dtype=np.float64)})
        if len(g) < 2:
            return empty
        ids = g[id_col].to_numpy()
        x = np.stack([np.asarray(e, dtype=np.float64) for e in g[emb_col]])
        norms = np.linalg.norm(x, axis=1)
        norms[norms == 0] = 1.0
        sims = (x / norms[:, None]) @ (x / norms[:, None]).T
        iu, ju = np.triu_indices(len(g), k=1)
        keep = sims[iu, ju] >= threshold
        if not keep.any():
            return empty
        a, b = ids[iu[keep]], ids[ju[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({
            "id_a": lo, "id_b": hi,
            "cosine": np.round(sims[iu[keep], ju[keep]], round_to)})

    return bucketed_map_groups(
        assigned, [cluster_col], cluster_pairs, skip_singletons=True)
