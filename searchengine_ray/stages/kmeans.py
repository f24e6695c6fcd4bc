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

import pyarrow as pa

from searchengine_ray.stages.knn import build_centroids
from searchengine_ray.stages.relational import (
    bucketed_map_groups, pre_aggregate)


def _emb_matrix(col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """Dense (n, d) float64 from an Arrow list column WITHOUT per-row
    Python: uniform-width list/fixed-size-list columns reshape straight
    off the values buffer (one vectorized astype); only ragged input
    falls back to the per-row stack.  This is why the batch stages here
    take ``batch_format="pyarrow"`` — a pandas batch has already paid
    the per-cell ndarray conversion before the stage sees it."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.FixedSizeListArray):
        d = col.type.list_size
        flat = np.asarray(col.values, dtype=np.float64)
        off = col.offset * d
        return flat[off:off + len(col) * d].reshape(len(col), d)
    if isinstance(col, (pa.ListArray, pa.LargeListArray)):
        off = np.asarray(col.offsets, dtype=np.int64)
        widths = np.diff(off)
        if widths.size and (widths == widths[0]).all():
            flat = np.asarray(col.values, dtype=np.float64)
            return flat[off[0]:off[-1]].reshape(len(col), int(widths[0]))
    return np.stack([np.asarray(e, dtype=np.float64)
                     for e in col.to_pylist()])


# Per-worker-process reusable workspaces (same discipline as
# minhash.batch_signatures / simhash.batch_simhash — see CLAUDE.md: this
# host first-touch page-faults fresh allocations at ~8 MB/s, so a
# batch×k scores buffer allocated per batch dominates the kernel at
# large k; measured 207 s → see BASELINE.md for the reusable-buffer
# number at k=1024).  Ray workers run one task at a time, so the module
# dict is race-free.
_WS: dict = {}


def _ws(key: str, shape: tuple) -> np.ndarray:
    buf = _WS.get(key)
    if buf is None or buf.shape[0] < shape[0] or buf.shape[1:] != shape[1:]:
        buf = np.empty(shape, dtype=np.float64)
        _WS[key] = buf
    return buf[:shape[0]]


def _emb_matrix_ws(col, key: str) -> np.ndarray:
    """``_emb_matrix`` casting into a reused buffer on the uniform-width
    fast path (assignment casts in place; no fresh float64 allocation)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = d = None
    if isinstance(col, pa.FixedSizeListArray):
        d = col.type.list_size
        off = col.offset * d
        flat = np.asarray(col.values)[off:off + len(col) * d]
    elif isinstance(col, (pa.ListArray, pa.LargeListArray)):
        offs = np.asarray(col.offsets, dtype=np.int64)
        widths = np.diff(offs)
        if widths.size and (widths == widths[0]).all():
            d = int(widths[0])
            flat = np.asarray(col.values)[offs[0]:offs[-1]]
    if flat is None:
        return _emb_matrix(col)
    out = _ws(key, (len(col), d))
    out.reshape(-1)[:] = flat  # casts float32→float64 into the buffer
    return out


def _nearest(emb: np.ndarray, c: np.ndarray, key: str) -> np.ndarray:
    """argmin ||x-c||² via the matmul identity, scores in a reused
    buffer: scores = ||c||² − 2·x·cᵀ (no n×k×d temporary, no fresh n×k
    allocation)."""
    scores = _ws(key, (emb.shape[0], c.shape[0]))
    np.matmul(emb, c.T, out=scores)
    scores *= -2.0
    scores += (c * c).sum(1)[None, :]
    return scores.argmin(1)


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
    batch_size: int = 65536,
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

        def partial(t: pa.Table) -> pd.DataFrame:
            c = ray.get(cent_ref)  # plasma-local, zero-copy
            emb = _emb_matrix_ws(t[emb_col], "fit_emb")
            a = _nearest(emb, c, "fit_scores")
            sums = _ws("fit_sums", (k, d))
            for j in range(d):  # d vectorized bincounts beat an n×d scatter
                sums[:, j] = np.bincount(a, weights=emb[:, j], minlength=k)
            cnt = np.bincount(a, minlength=k).astype(np.float64)
            present = np.nonzero(cnt > 0)[0]
            block = np.hstack([sums[present], cnt[present, None]])  # p×(d+1)
            return pd.DataFrame({
                "c": np.repeat(present, d + 1),
                "dim": np.tile(np.arange(d + 1, dtype=np.int64),
                               present.size),
                "s": block.ravel()})

        # explicit batch_size: Ray's 1024-row default would mean ~1000
        # tiny matmuls + 1000 partial emissions per 1M rows — one 65536-row
        # batch is a single well-shaped BLAS call and one k×(d+1) partial
        partials = ds.map_batches(partial, batch_format="pyarrow",
                                  batch_size=batch_size)
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
    out_col: str = "cluster_id", batch_size: int = 65536,
) -> Dataset:
    """Attach each row's nearest-centroid id — one map-batches pass, the
    centroid table broadcast once via ``ray.put``."""
    cent_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def with_col(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)  # plasma-local, zero-copy
        emb = _emb_matrix_ws(t[emb_col], "assign_emb")
        a = _nearest(emb, c, "assign_scores")
        return t.append_column(out_col, pa.array(a.astype(np.int64)))

    return ds.map_batches(with_col, batch_format="pyarrow",
                          batch_size=batch_size)


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


# --- deterministic, oracle-gateable Lloyd's ---------------------------------
#
# `kmeans_fit` above serves SemDeDup, where only the PAIR semantics are
# oracle-gated and the clustering is an opaque partitioner.  The traced
# variant below makes the cluster assignment ITSELF SQL-checkable:
# deterministic min-id init (no sample), early stop at an assignment fixed
# point detected by an order-independent signature, and a final assignment
# whose winner is the lexicographic min of (round(euclidean, 6), cluster) —
# the exact rule a DuckDB `row_number() OVER (ORDER BY round(list_distance(
# ..), 6), cluster)` oracle computes over the engine-persisted centroid
# table, so ulp differences between the matmul-identity kernel and SQL's
# direct sum-of-squares cannot flip the emitted row below the rounding
# grain.

_SIG_MULT = np.int64(0x9E3779B97F4A7C15 - (1 << 64))  # odd 64-bit mix const


def deterministic_init(
    ds: Dataset, k: int, emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """The k smallest-id vectors: per-batch k-smallest partials, driver
    merge — O(k × blocks) driver rows, no corpus sort, no sampling."""

    def part(df: pd.DataFrame) -> pd.DataFrame:
        idx = np.argsort(df[id_col].to_numpy(), kind="stable")[:k]
        return df.iloc[idx][[id_col, emb_col]]

    top = (ds.map_batches(part, batch_format="pandas").to_pandas()
           .sort_values(id_col, kind="stable").head(k))
    return np.stack([np.asarray(e, dtype=np.float64) for e in top[emb_col]])


def kmeans_fit_traced(
    ds: Dataset, num_clusters: int = 8, emb_col: str = "embedding",
    id_col: str = "vec_id", max_iters: int = 30, batch_size: int = 65536,
    driver_reduce_max_rows: int = DRIVER_REDUCE_MAX_ROWS,
) -> tuple[np.ndarray, dict]:
    """Lloyd's to an assignment fixed point or ``max_iters``.

    Per iteration ONE corpus pass emits a k-row wide moment frame per
    batch — (cluster, count, inertia, signature, per-dim sums) — reduced
    by ``pre_aggregate`` so the driver sees exactly k×(d+3) scalars.
    The signature is Σ mix(id)·(cluster+1) in wrapping int64: order-
    independent, and changes whp when any single vector moves cluster, so
    signature-stable ⇒ the assignment is a Lloyd fixed point and the loop
    stops without re-deriving centroids.  Empty clusters keep their
    previous centroid (FAISS/sklearn semantics).  Returns
    (centroids k×d float64, info) with info = {n_iters, converged,
    inertia trace (monotone non-increasing — pinned by test)}."""
    cent = deterministic_init(ds, num_clusters, emb_col, id_col)
    k, d = cent.shape
    scols = [f"s{j}" for j in range(d)]
    inertia_trace: list[float] = []
    prev_sig = None
    converged = False
    it = 0
    # same size routing as kmeans_fit: below the threshold the k-row
    # per-batch partials reduce on the driver (≤ ceil(n/batch) × k rows)
    # instead of paying one pre_aggregate all-to-all PER ITERATION —
    # at sf-scale latency each saved exchange is ~1 s × n_iters
    driver_reduce = ds.count() <= driver_reduce_max_rows

    for it in range(1, max_iters + 1):
        cent_ref = ray.put(cent)

        def moments(t: pa.Table) -> pd.DataFrame:
            c = ray.get(cent_ref)  # plasma-local, zero-copy
            if not t.num_rows:
                e = {"cluster": np.zeros(0, np.int64),
                     "cnt": np.zeros(0, np.int64),
                     "inertia": np.zeros(0, np.float64),
                     "sig": np.zeros(0, np.int64)}
                e.update({s: np.zeros(0, np.float64) for s in scols})
                return pd.DataFrame(e)
            emb = _emb_matrix_ws(t[emb_col], "tr_emb")
            ids = t[id_col].to_numpy().astype(np.int64, copy=False)
            sc = _ws("tr_scores", (emb.shape[0], k))
            np.matmul(emb, c.T, out=sc)
            sc *= -2.0
            sc += (c * c).sum(1)[None, :]
            a = sc.argmin(1)
            # winner d² restores the dropped ||x||² term; clamp cancellation
            d2w = sc[np.arange(len(a)), a] + (emb * emb).sum(1)
            np.maximum(d2w, 0.0, out=d2w)
            sums = _ws("tr_sums", (k, d))
            for j in range(d):  # d vectorized bincounts beat an n×d scatter
                sums[:, j] = np.bincount(a, weights=emb[:, j], minlength=k)
            out = {"cluster": np.arange(k, dtype=np.int64),
                   "cnt": np.bincount(a, minlength=k).astype(np.int64),
                   "inertia": np.bincount(a, weights=d2w, minlength=k),
                   "sig": np.zeros(k, dtype=np.int64)}
            # order-independent wrapping-int64 signature, carried on the
            # (always-present) cluster-0 row
            out["sig"][0] = (ids * _SIG_MULT * (a.astype(np.int64) + 1)).sum()
            for j in range(d):
                out[scols[j]] = sums[:, j].copy()
            return pd.DataFrame(out)

        partials = ds.map_batches(moments, batch_format="pyarrow",
                                  batch_size=batch_size)
        if driver_reduce:
            agg = (partials.to_pandas()
                   .groupby("cluster", as_index=False).sum()
                   .sort_values("cluster"))
        else:
            specs: dict = {"cnt": ("cnt", "sum"),
                           "inertia": ("inertia", "sum"),
                           "sig": ("sig", "sum")}
            specs.update({s: (s, "sum") for s in scols})
            agg = (pre_aggregate(partials, ["cluster"], specs)
                   .to_pandas().sort_values("cluster"))

        cnt = agg["cnt"].to_numpy(dtype=np.float64)
        sums = agg[scols].to_numpy(dtype=np.float64)
        inertia_trace.append(float(agg["inertia"].sum()))
        sig = int(agg["sig"].to_numpy(dtype=np.int64).sum())  # wrapping
        if prev_sig is not None and sig == prev_sig:
            # same assignment as the pass that produced `cent` ⇒ the mean
            # update is a no-op: fixed point, stop without touching cent
            converged = True
            break
        prev_sig = sig
        cent = np.where(cnt[:, None] > 0,
                        sums / np.maximum(cnt[:, None], 1.0), cent)

    return cent, {"n_iters": it, "converged": converged,
                  "inertia": inertia_trace}


def kmeans_assign_ranked(
    ds: Dataset, centroids: np.ndarray, emb_col: str = "embedding",
    id_col: str = "vec_id", round_to: int = 6, batch_size: int = 65536,
) -> Dataset:
    """Map-only final assignment: (id, cluster, dist) where dist =
    round(√d², ``round_to``) and the winner is the lexicographic min of
    (rounded dist, cluster) — numpy argmin returns the FIRST minimum, i.e.
    the lowest cluster id among rounded ties, which is exactly the SQL
    oracle's ``ORDER BY dist, cluster`` rule."""
    cent_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(t: pa.Table) -> pd.DataFrame:
        c = ray.get(cent_ref)  # plasma-local, zero-copy
        if not t.num_rows:
            return pd.DataFrame({id_col: np.zeros(0, np.int64),
                                 "cluster": np.zeros(0, np.int64),
                                 "dist": np.zeros(0, np.float64)})
        emb = _emb_matrix_ws(t[emb_col], "rk_emb")
        sc = _ws("rk_scores", (emb.shape[0], c.shape[0]))
        np.matmul(emb, c.T, out=sc)
        sc *= -2.0
        sc += (c * c).sum(1)[None, :]
        sc += (emb * emb).sum(1)[:, None]
        np.maximum(sc, 0.0, out=sc)  # matmul-identity cancellation clamp
        np.sqrt(sc, out=sc)
        np.round(sc, round_to, out=sc)
        a = sc.argmin(1)
        return pd.DataFrame({
            id_col: t[id_col].to_numpy().astype(np.int64, copy=False),
            "cluster": a.astype(np.int64),
            "dist": sc[np.arange(len(a)), a].copy()})

    return ds.map_batches(assign, batch_format="pyarrow",
                          batch_size=batch_size)
