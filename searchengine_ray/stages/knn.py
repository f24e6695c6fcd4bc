"""Similarity search over an embedding column.

- ``knn_bruteforce``: exact cosine top-k — one numpy matmul per batch
  against a broadcast query matrix, per-batch local top-k, tiny global
  merge.  The all-data path never leaves the batch tasks; only k rows per
  batch reach the driver-side merge.
- ``build_ivf_index`` / ``ivf_probe``: the IVF scale path, PERSISTED —
  the centroid assignment is written ONCE as a hive-partitioned parquet
  layout (one directory per inverted list) and every query reads only its
  ``nprobe`` closest list directories.  This is the "write once, probe
  many" shape the reference's pickled index implements single-process
  (retrieve_query.py:18-35): a query never rescans the corpus, and the
  partition pruning happens at the storage layer (directory selection),
  not as a filter over a full read.
- ``knn_ivf``: convenience build+probe for one-shot use (the SQL-gated
  query path); production callers build once and probe many times.
"""

from __future__ import annotations

import os

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

    # two-level merge: the driver sees O(k × fanin) rows, not k per batch
    from searchengine_ray.stages.relational import global_topk

    partials = ds.map_batches(local_topk, batch_format="pandas", batch_size=4096)
    return global_topk(partials, ["cosine", "vec_id"], [False, True], k)


DEFAULT_MAX_SAMPLE = 4096


def build_centroids(ds: Dataset, num_centroids: int = 16,
                    max_sample: int = DEFAULT_MAX_SAMPLE,
                    emb_col: str = "embedding", iters: int = 5,
                    seed: int = 5) -> np.ndarray:
    """Deterministic k-means over a COUNT-capped sample.

    The sample fraction derives from ``max_sample / count`` (count is
    parquet-metadata-cheap) and a ``limit`` hard-caps the driver pull, so
    the driver never holds more than ``max_sample`` vectors regardless of
    corpus size — a fixed fraction would be an OOM at 100 TB."""
    n = ds.count()
    frac = min(1.0, max_sample / max(n, 1))
    sample = ds.random_sample(frac, seed=seed).limit(max_sample).to_pandas()
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


def _assign_lists(cent_ref, emb_col: str):
    """Per-batch nearest-centroid assignment via the matmul identity
    argmin ||x-c||² = argmin (||c||² - 2 x·c) — no n×k×dim temporary."""

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cent_ref)  # plasma-local, zero-copy
        emb = np.stack([np.asarray(e, dtype=np.float64) for e in df[emb_col]])
        scores = (c * c).sum(1)[None, :] - 2.0 * (emb @ c.T)
        df["list_id"] = scores.argmin(1).astype(np.int64)
        return df

    return assign


def build_ivf_index(
    ds: Dataset, path: str, num_centroids: int = 16,
    emb_col: str = "embedding", max_sample: int = DEFAULT_MAX_SAMPLE,
    seed: int = 5,
) -> str:
    """Write the IVF layout: rows land in hive-partitioned parquet
    directories ``{path}/list_id=<c>/`` (their nearest centroid's inverted
    list); centroids persist alongside as ``_centroids.npy``.  One full
    pass over the corpus, done once — queries then read only the probed
    list directories."""
    import shutil

    cent = build_centroids(ds, num_centroids, max_sample, emb_col, seed=seed)
    shutil.rmtree(path, ignore_errors=True)
    cent_ref = ray.put(cent)
    # one block per list before the write — see build_ivfpq_index: hive
    # partitioning alone writes (input blocks × nlist) tiny files
    (ds.map_batches(_assign_lists(cent_ref, emb_col), batch_format="pandas")
       .groupby("list_id")
       .map_groups(lambda g: g, batch_format="pandas")
       .write_parquet(path, partition_cols=["list_id"]))
    os.makedirs(path, exist_ok=True)  # an all-empty write creates no dir
    np.save(os.path.join(path, "_centroids.npy"), cent)
    return path


def ivf_insert(path: str, delta: Dataset, emb_col: str = "embedding") -> str:
    """Incremental insert into a persisted IVF layout (the FAISS ``add()``
    contract): new vectors assign to the EXISTING centroids — no retrain,
    no rewrite of existing list files — and land as NEW parquet files
    appended inside their ``list_id=<c>/`` directories (Ray's writer
    names files uniquely, so concurrent history accumulates; a probe
    simply reads more files per list).  Index maintenance therefore costs
    O(delta), never O(corpus) — the write-once/read-many layout stays
    valid because list membership depends only on the frozen centroids.

    Durability contract: like any multi-file append, a crashed insert can
    leave a PARTIAL delta — wrap calls in the `sources/resumable.py`
    marker discipline when exactly-once matters.  Rebalancing after heavy
    drift (lists growing skewed) is a full ``build_ivf_index`` rebuild,
    by design."""
    cent = np.load(os.path.join(path, "_centroids.npy"))
    cent_ref = ray.put(cent)
    # one block per touched list before the write (same tiny-files
    # rationale as build_ivf_index)
    (delta.map_batches(_assign_lists(cent_ref, emb_col),
                       batch_format="pandas")
          .groupby("list_id")
          .map_groups(lambda g: g, batch_format="pandas")
          .write_parquet(path, partition_cols=["list_id"]))
    return path


def ivf_probe(
    path: str, query: np.ndarray, k: int = 10, nprobe: int = 4,
    id_col: str = "vec_id", emb_col: str = "embedding",
    exclude_ids: set | None = None,
) -> pd.DataFrame:
    """Top-k over ONLY the ``nprobe`` inverted lists closest to the query:
    the read plan enumerates those partition directories, so corpus I/O is
    O(corpus × nprobe / num_centroids) per query, not a full scan."""
    import ray.data as rd

    cent = np.load(os.path.join(path, "_centroids.npy"))
    q = np.asarray(query, dtype=np.float64)
    order = np.argsort(((cent - q) ** 2).sum(1))[:nprobe]
    dirs = [os.path.join(path, f"list_id={int(c)}") for c in order]
    dirs = [d for d in dirs if os.path.isdir(d)]  # empty lists write no dir
    # read_parquet wants FILES when given a list — enumerate the probed
    # list directories (local-fs equivalent of a partition-pruned manifest)
    files = [os.path.join(d, f) for d in dirs
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if not files:
        return pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                             "cosine": pd.Series([], dtype=np.float64)})
    survivors = rd.read_parquet(files, columns=[id_col, emb_col])
    return knn_bruteforce(survivors, q, k, id_col, emb_col, exclude_ids)


def knn_ivf(
    ds: Dataset, query: np.ndarray, k: int = 10, num_centroids: int = 16,
    nprobe: int = 4, id_col: str = "vec_id", emb_col: str = "embedding",
    exclude_ids: set | None = None, seed: int = 5,
    index_path: str | None = None,
) -> pd.DataFrame:
    """Build-once + probe in one call.  ``index_path`` defaults to a fresh
    scratch dir; pass an existing built path to skip the build (the
    many-queries production shape — see ``build_ivf_index``)."""
    import tempfile

    if index_path is None or not os.path.exists(
            os.path.join(index_path, "_centroids.npy")):
        if index_path is None:
            index_path = tempfile.mkdtemp(prefix="sr_ivf_")
        build_ivf_index(ds, index_path, num_centroids, emb_col,
                        seed=seed)
    return ivf_probe(index_path, query, k, nprobe, id_col, emb_col,
                     exclude_ids)


# --- product quantization (PQ / ADC) -----------------------------------------
#
# The compressed-scan ANN path (Jégou et al. 2011, "Product Quantization for
# Nearest Neighbor Search"): vectors are L2-normalized and split into m
# contiguous subspaces; each subspace is vector-quantized to ksub centroids,
# so a d×float32 vector becomes m uint8 codes (d=64, m=8 ⇒ 32× smaller).
# Query time computes one (m × ksub) inner-product table per query and scans
# CODES ONLY — the asymmetric distance computation (ADC) — then re-ranks the
# top ``refine`` candidates with exact cosines from the raw vectors.  At
# 100 TB the codes for 10^10 × 64-d vectors are ~80 GB — object-store
# resident across a cluster — while the raw vectors stay in cold storage and
# are touched only for the O(Q × refine) refine rows.

DEFAULT_PQ_M = 8
DEFAULT_PQ_KSUB = 64


def _l2_normalize(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=1)
    n[n == 0] = 1.0
    return x / n[:, None]


def train_pq(ds: Dataset, m: int = DEFAULT_PQ_M, ksub: int = DEFAULT_PQ_KSUB,
             emb_col: str = "embedding", max_sample: int = DEFAULT_MAX_SAMPLE,
             seed: int = 7, iters: int = 8) -> np.ndarray:
    """Per-subspace k-means codebooks over a COUNT-capped sample (the same
    driver-bounded sampling discipline as ``build_centroids``).  Returns
    float64 ``[m, ksub, d/m]``; requires d % m == 0."""
    n = ds.count()
    frac = min(1.0, max_sample / max(n, 1))
    sample = ds.random_sample(frac, seed=seed).limit(max_sample).to_pandas()
    x = _l2_normalize(np.stack(
        [np.asarray(e, dtype=np.float64) for e in sample[emb_col]]))
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    ksub = min(ksub, x.shape[0])
    rng = np.random.RandomState(seed)
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        xs = x[:, j * dsub:(j + 1) * dsub]
        cent = xs[rng.choice(xs.shape[0], size=ksub, replace=False)].copy()
        for _ in range(iters):
            scores = (cent * cent).sum(1)[None, :] - 2.0 * (xs @ cent.T)
            assign = scores.argmin(1)
            for c in range(ksub):
                msk = assign == c
                if msk.any():
                    cent[c] = xs[msk].mean(0)
        books[j] = cent
    return books


def _encode_block(emb: np.ndarray, books: np.ndarray) -> np.ndarray:
    """L2-normalized vectors → uint8 codes [n, m] (nearest centroid per
    subspace via the matmul identity — no n×ksub×dsub temporary)."""
    m, ksub, dsub = books.shape
    codes = np.empty((emb.shape[0], m), dtype=np.uint8)
    for j in range(m):
        xs = emb[:, j * dsub:(j + 1) * dsub]
        c = books[j]
        scores = (c * c).sum(1)[None, :] - 2.0 * (xs @ c.T)
        codes[:, j] = scores.argmin(1).astype(np.uint8)
    return codes


def pq_encode(ds: Dataset, books: np.ndarray, id_col: str = "vec_id",
              emb_col: str = "embedding") -> Dataset:
    """Corpus → (id, code_0..code_{m-1}) uint8 columns.  One map-only pass;
    built once, scanned by every query after."""
    books_ref = ray.put(books)
    m = books.shape[0]

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(books_ref)
        emb = _l2_normalize(np.stack(
            [np.asarray(e, dtype=np.float64) for e in df[emb_col]]))
        codes = _encode_block(emb, b)
        out = {id_col: df[id_col].to_numpy()}
        for j in range(m):
            out[f"code_{j}"] = codes[:, j]
        return pd.DataFrame(out)

    return ds.map_batches(encode, batch_format="pandas", batch_size=4096)


def knn_pq_multi(
    ds: Dataset, queries: "pd.DataFrame", books: np.ndarray, k: int = 10,
    refine: int | None = 50, id_col: str = "vec_id",
    emb_col: str = "embedding", exclude_self: bool = True,
) -> pd.DataFrame:
    """Batched PQ search: ADC scan over codes → top-``refine`` candidates
    per query → exact-cosine re-rank of the candidates only.

    ``refine=None`` re-ranks EVERY row (the exactness gate: output must
    equal ``knn_bruteforce_multi`` — pinned by tests and the SQL oracle;
    production uses a small ``refine``, trading recall for touching only
    O(Q × refine) raw vectors).  Returns (query_id, vec_id, cosine) sorted
    (query_id, cosine desc, vec_id), k rows per query."""
    qids = queries["query_id"].to_numpy()
    Q = _l2_normalize(np.stack(
        [np.asarray(v, dtype=np.float64) for v in queries["vec"]]))
    m, ksub, dsub = books.shape
    # per-query ADC tables: tab[q, j, c] = q_sub · centroid_{j,c}
    tab = np.stack(
        [Q[:, j * dsub:(j + 1) * dsub] @ books[j].T for j in range(m)], axis=1)

    cand_per_q: dict | None = None
    if refine is not None:
        codes_ds = pq_encode(ds, books, id_col, emb_col)
        tab_ref = ray.put(tab)
        q_ref = ray.put(qids)

        def adc_local(df: pd.DataFrame) -> pd.DataFrame:
            t = ray.get(tab_ref)
            ids_q = ray.get(q_ref)
            ids = df[id_col].to_numpy()
            n = len(df)
            acc = np.zeros((t.shape[0], n), dtype=np.float64)
            for j in range(t.shape[1]):
                acc += t[:, j, :][:, df[f"code_{j}"].to_numpy()]
            frames = []
            for qi in range(t.shape[0]):
                s, vid = acc[qi], ids
                if exclude_self:
                    keep = vid != ids_q[qi]
                    s, vid = s[keep], vid[keep]
                r_eff = min(refine, s.size)
                if not r_eff:
                    continue
                idx = np.argpartition(-s, r_eff - 1)[:r_eff]
                frames.append(pd.DataFrame({
                    "query_id": np.full(r_eff, ids_q[qi]),
                    "vec_id": vid[idx], "adc": s[idx]}))
            if not frames:
                return pd.DataFrame({
                    "query_id": pd.Series([], dtype=np.int64),
                    "vec_id": pd.Series([], dtype=np.int64),
                    "adc": pd.Series([], dtype=np.float64)})
            return pd.concat(frames, ignore_index=True)

        def grouped_refine(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return df
            return (df.sort_values(["query_id", "adc", "vec_id"],
                                   ascending=[True, False, True],
                                   kind="mergesort")
                    .groupby("query_id", sort=False).head(refine))

        parts = (codes_ds.map_batches(adc_local, batch_format="pandas",
                                      batch_size=8192)
                 .repartition(32)
                 .map_batches(grouped_refine, batch_format="pandas",
                              batch_size=None))
        cand = grouped_refine(parts.to_pandas())  # O(Q × refine) rows
        cand_per_q = {qid: set(g["vec_id"])
                      for qid, g in cand.groupby("query_id", sort=False)}

    # exact re-rank over candidates only (or the whole corpus at refine=None)
    cand_ref = ray.put(cand_per_q)
    q_ref2 = ray.put((qids, Q))

    def exact_local(df: pd.DataFrame) -> pd.DataFrame:
        per_q = ray.get(cand_ref)
        ids_q, qm = ray.get(q_ref2)
        if per_q is not None:
            union: set = set().union(*per_q.values()) if per_q else set()
            df = df[df[id_col].isin(union)]
        if not len(df):
            return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                                 "vec_id": pd.Series([], dtype=np.int64),
                                 "cosine": pd.Series([], dtype=np.float64)})
        emb = np.stack([np.asarray(e, dtype=np.float64) for e in df[emb_col]])
        vnorm = np.linalg.norm(emb, axis=1)
        vnorm[vnorm == 0] = 1.0
        sims = (emb @ qm.T) / vnorm[:, None]  # queries already unit-norm
        ids = df[id_col].to_numpy()
        frames = []
        for qi in range(qm.shape[0]):
            s, vid = sims[:, qi], ids
            keep = np.ones(vid.size, dtype=bool)
            if exclude_self:
                keep &= vid != ids_q[qi]
            if per_q is not None:
                allowed = per_q.get(ids_q[qi], set())
                keep &= np.fromiter((v in allowed for v in vid), dtype=bool,
                                    count=vid.size)
            s, vid = s[keep], vid[keep]
            k_eff = min(k, s.size)
            if not k_eff:
                continue
            idx = np.argpartition(-s, k_eff - 1)[:k_eff]
            frames.append(pd.DataFrame({
                "query_id": np.full(k_eff, ids_q[qi]),
                "vec_id": vid[idx], "cosine": s[idx]}))
        if not frames:
            return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                                 "vec_id": pd.Series([], dtype=np.int64),
                                 "cosine": pd.Series([], dtype=np.float64)})
        return pd.concat(frames, ignore_index=True)

    def grouped_topk(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        return (df.sort_values(["query_id", "cosine", "vec_id"],
                               ascending=[True, False, True], kind="mergesort")
                .groupby("query_id", sort=False).head(k))

    parts = (ds.map_batches(exact_local, batch_format="pandas",
                            batch_size=4096)
             .repartition(32)
             .map_batches(grouped_topk, batch_format="pandas",
                          batch_size=None))
    out = parts.to_pandas()
    return (grouped_topk(out).reset_index(drop=True) if len(out) else out)


# --- IVF-PQ: PQ codes inside the persisted inverted-list layout --------------


def build_ivfpq_index(
    ds: Dataset, path: str, num_centroids: int = 16, m: int = DEFAULT_PQ_M,
    ksub: int = DEFAULT_PQ_KSUB, id_col: str = "vec_id",
    emb_col: str = "embedding", max_sample: int = DEFAULT_MAX_SAMPLE,
    seed: int = 5,
) -> str:
    """The composed scale layout: hive-partitioned inverted lists
    (``build_ivf_index``) whose rows carry PQ codes alongside the raw
    vector.  A probe reads ONLY the ``nprobe`` list directories and, within
    them, ONLY the uint8 code columns for the ADC scan (parquet column
    pruning) — raw vectors are touched just for the O(Q × refine) re-rank
    rows.  PQ here quantizes the normalized vector directly (IVF-Flat+PQ;
    classic IVFADC quantizes residuals — documented delta, the exactness
    gate is unaffected because re-rank uses raw vectors)."""
    import shutil

    cent = build_centroids(ds, num_centroids, max_sample, emb_col, seed=seed)
    books = train_pq(ds, m=m, ksub=ksub, emb_col=emb_col,
                     max_sample=max_sample, seed=seed)
    shutil.rmtree(path, ignore_errors=True)
    cent_ref = ray.put(cent)
    books_ref = ray.put(books)

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cent_ref)
        b = ray.get(books_ref)
        emb = np.stack([np.asarray(e, dtype=np.float64) for e in df[emb_col]])
        scores = (c * c).sum(1)[None, :] - 2.0 * (emb @ c.T)
        df = df.copy()
        df["list_id"] = scores.argmin(1).astype(np.int64)
        # keep list_id as a data column too: ray's file-list reads drop
        # hive partition columns
        df["list_id_col"] = df["list_id"]
        codes = _encode_block(_l2_normalize(emb), b)
        for j in range(b.shape[0]):
            df[f"code_{j}"] = codes[:, j]
        return df

    # Co-locate each inverted list into one block before the partitioned
    # write: without this, hive partitioning writes (input blocks × nlist)
    # tiny files — measured 904 files / 9 s probe reads at sf0.1 vs 16
    # files / sub-second after.  One all-to-all, amortized by build-once.
    # (At corpus scale where one list exceeds a block, shard the shuffle
    # key to (list_id, hash(id) % ceil(rows/nlist/target)) instead.)
    (ds.map_batches(prep, batch_format="pandas")
       .groupby("list_id")
       .map_groups(lambda g: g, batch_format="pandas")
       .write_parquet(path, partition_cols=["list_id"]))
    os.makedirs(path, exist_ok=True)
    np.save(os.path.join(path, "_centroids.npy"), cent)
    np.save(os.path.join(path, "_books.npy"), books)
    return path


def ivfpq_probe(
    path: str, queries: "pd.DataFrame", k: int = 10, nprobe: int = 4,
    refine: int | None = 50, id_col: str = "vec_id",
    emb_col: str = "embedding", exclude_self: bool = True,
) -> pd.DataFrame:
    """Batched IVF-PQ search: every query reads only its ``nprobe`` nearest
    inverted lists; the ADC scan touches code columns only; the exact
    re-rank touches raw vectors for candidates only (``refine=None`` =
    re-rank every probed row — with ``nprobe=num_centroids`` that makes the
    whole path exact, the ``knn_ivf nprobe=nlist`` gating discipline).
    Returns (query_id, vec_id, cosine), k rows per query."""
    import ray.data as rd

    cent = np.load(os.path.join(path, "_centroids.npy"))
    books = np.load(os.path.join(path, "_books.npy"))
    m = books.shape[0]
    dsub = books.shape[2]
    qids = queries["query_id"].to_numpy()
    Qraw = np.stack([np.asarray(v, dtype=np.float64)
                     for v in queries["vec"]])
    Q = _l2_normalize(Qraw)
    # per-query probed lists: RAW-space L2 to the coarse centroids (the
    # centroids and the row assignment both live in raw space, like
    # ivf_probe — selecting with the normalized query would rank lists by
    # centroid norm, not proximity)
    d2 = ((cent[None, :, :] - Qraw[:, None, :]) ** 2).sum(-1)
    probe_lists = np.argsort(d2, axis=1)[:, :nprobe]
    probed_union = sorted({int(c) for row in probe_lists for c in row})
    allowed = {int(q): set(int(c) for c in probe_lists[i])
               for i, q in enumerate(qids)}
    dirs = [os.path.join(path, f"list_id={c}") for c in probed_union]
    files = [os.path.join(d, f) for d in dirs if os.path.isdir(d)
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    empty = pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                          "vec_id": pd.Series([], dtype=np.int64),
                          "cosine": pd.Series([], dtype=np.float64)})
    if not files:
        return empty

    tab = np.stack(
        [Q[:, j * dsub:(j + 1) * dsub] @ books[j].T for j in range(m)], axis=1)
    tab_ref = ray.put((qids, tab, allowed))

    cand_per_q: dict | None = None
    if refine is not None:
        code_cols = [id_col, "list_id_col"] + [f"code_{j}" for j in range(m)]
        codes_ds = rd.read_parquet(files, columns=code_cols)

        def adc_local(df: pd.DataFrame) -> pd.DataFrame:
            ids_q, t, allow = ray.get(tab_ref)
            ids = df[id_col].to_numpy()
            lists = df["list_id_col"].to_numpy()
            acc = np.zeros((t.shape[0], len(df)), dtype=np.float64)
            for j in range(t.shape[1]):
                acc += t[:, j, :][:, df[f"code_{j}"].to_numpy()]
            frames = []
            for qi in range(t.shape[0]):
                ok = np.fromiter((l in allow[int(ids_q[qi])] for l in lists),
                                 dtype=bool, count=lists.size)
                if exclude_self:
                    ok &= ids != ids_q[qi]
                s, vid = acc[qi][ok], ids[ok]
                r_eff = min(refine, s.size)
                if not r_eff:
                    continue
                idx = np.argpartition(-s, r_eff - 1)[:r_eff]
                frames.append(pd.DataFrame({
                    "query_id": np.full(r_eff, ids_q[qi]),
                    "vec_id": vid[idx], "adc": s[idx]}))
            if not frames:
                return pd.DataFrame({
                    "query_id": pd.Series([], dtype=np.int64),
                    "vec_id": pd.Series([], dtype=np.int64),
                    "adc": pd.Series([], dtype=np.float64)})
            return pd.concat(frames, ignore_index=True)

        def grouped_refine(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return df
            return (df.sort_values(["query_id", "adc", "vec_id"],
                                   ascending=[True, False, True],
                                   kind="mergesort")
                    .groupby("query_id", sort=False).head(refine))

        parts = (codes_ds.map_batches(adc_local, batch_format="pandas",
                                      batch_size=8192)
                 .repartition(16)
                 .map_batches(grouped_refine, batch_format="pandas",
                              batch_size=None))
        cand = grouped_refine(parts.to_pandas())
        cand_per_q = {int(qid): set(g["vec_id"])
                      for qid, g in cand.groupby("query_id", sort=False)}

    vec_ds = rd.read_parquet(files, columns=[id_col, "list_id_col", emb_col])
    state_ref = ray.put((qids, Q, allowed, cand_per_q))

    def exact_local(df: pd.DataFrame) -> pd.DataFrame:
        ids_q, qm, allow, per_q = ray.get(state_ref)
        if per_q is not None:
            union: set = set().union(*per_q.values()) if per_q else set()
            df = df[df[id_col].isin(union)]
        if not len(df):
            return empty
        emb = np.stack([np.asarray(e, dtype=np.float64) for e in df[emb_col]])
        vnorm = np.linalg.norm(emb, axis=1)
        vnorm[vnorm == 0] = 1.0
        sims = (emb @ qm.T) / vnorm[:, None]
        ids = df[id_col].to_numpy()
        lists = df["list_id_col"].to_numpy()
        frames = []
        for qi in range(qm.shape[0]):
            keep = np.fromiter((l in allow[int(ids_q[qi])] for l in lists),
                               dtype=bool, count=lists.size)
            if exclude_self:
                keep &= ids != ids_q[qi]
            if per_q is not None:
                al = per_q.get(int(ids_q[qi]), set())
                keep &= np.fromiter((v in al for v in ids), dtype=bool,
                                    count=ids.size)
            s, vid = sims[:, qi][keep], ids[keep]
            k_eff = min(k, s.size)
            if not k_eff:
                continue
            idx = np.argpartition(-s, k_eff - 1)[:k_eff]
            frames.append(pd.DataFrame({
                "query_id": np.full(k_eff, ids_q[qi]),
                "vec_id": vid[idx], "cosine": s[idx]}))
        return pd.concat(frames, ignore_index=True) if frames else empty

    def grouped_topk(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        return (df.sort_values(["query_id", "cosine", "vec_id"],
                               ascending=[True, False, True], kind="mergesort")
                .groupby("query_id", sort=False).head(k))

    parts = (vec_ds.map_batches(exact_local, batch_format="pandas",
                                batch_size=4096)
             .repartition(16)
             .map_batches(grouped_topk, batch_format="pandas",
                          batch_size=None))
    out = parts.to_pandas()
    return (grouped_topk(out).reset_index(drop=True) if len(out) else out)


def knn_bruteforce_multi(
    ds: Dataset, queries: "pd.DataFrame", k: int = 10,
    id_col: str = "vec_id", emb_col: str = "embedding",
    exclude_self: bool = True,
) -> pd.DataFrame:
    """BATCHED exact top-k: many query vectors answered in one corpus pass —
    the batched-inference shape (one n×d @ d×Q matmul per batch serves
    every query at once, instead of Q passes).

    ``queries``: DataFrame (query_id, vec).  Per batch: local top-k per
    query; partials reduce through a coalesced grouped-top-k level, so the
    driver merges O(k × Q × fanin) rows.  ``exclude_self`` drops rows
    whose id equals the query id (query vectors drawn from the corpus).
    Returns (query_id, vec_id, cosine) with k rows per query, sorted
    (query_id, cosine desc, vec_id)."""
    qids = queries["query_id"].to_numpy()
    Q = np.stack([np.asarray(v, dtype=np.float64) for v in queries["vec"]])
    qn = np.linalg.norm(Q, axis=1)
    qn[qn == 0] = 1.0
    q_ref = ray.put((qids, Q, qn))

    def local(df: pd.DataFrame) -> pd.DataFrame:
        ids_q, qm, qnorm = ray.get(q_ref)
        emb = np.stack([np.asarray(e, dtype=np.float64) for e in df[emb_col]])
        vnorm = np.linalg.norm(emb, axis=1)
        vnorm[vnorm == 0] = 1.0
        sims = (emb @ qm.T) / (vnorm[:, None] * qnorm[None, :])  # n × Q
        ids = df[id_col].to_numpy()
        frames = []
        for j in range(qm.shape[0]):
            s = sims[:, j]
            vid = ids
            if exclude_self:
                keep = vid != ids_q[j]
                s, vid = s[keep], vid[keep]
            k_eff = min(k, s.size)
            if not k_eff:
                continue
            idx = np.argpartition(-s, k_eff - 1)[:k_eff]
            frames.append(pd.DataFrame({
                "query_id": np.full(k_eff, ids_q[j]),
                "vec_id": vid[idx], "cosine": s[idx]}))
        if not frames:
            return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                                 "vec_id": pd.Series([], dtype=np.int64),
                                 "cosine": pd.Series([], dtype=np.float64)})
        return pd.concat(frames, ignore_index=True)

    def grouped_topk(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        return (df.sort_values(["query_id", "cosine", "vec_id"],
                               ascending=[True, False, True], kind="mergesort")
                .groupby("query_id", sort=False).head(k))

    parts = (ds.map_batches(local, batch_format="pandas", batch_size=4096)
             .repartition(32)
             .map_batches(grouped_topk, batch_format="pandas", batch_size=None))
    out = parts.to_pandas()
    return (grouped_topk(out).reset_index(drop=True) if len(out) else out)


def mmr_select(qvec: np.ndarray, cand_ids: np.ndarray, cand_mat: np.ndarray,
               k: int, lam: float = 0.7) -> pd.DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998)
    of ONE query's bounded candidate list: greedily pick
    argmax λ·cos(q, d) − (1−λ)·max_{s∈S} cos(d, s) — relevance traded
    against redundancy, the diversity step after dense retrieval.

    This is deliberately DRIVER work: the corpus-scaled stage is the
    retrieval that produced the candidates (``knn_bruteforce_multi`` /
    IVF probes); MMR itself is O(k·C + C²·d) on a C ≈ 100 list — the
    same bounded-candidate contract as ``rrf_fuse``.  Candidates are
    processed in ascending-id order so exact score ties resolve to the
    smallest id (numpy argmax returns the first maximum).  Returns
    (rank, vec_id, mmr_score) with mmr_score the value at selection
    time, rounded to 6."""
    ids, rel, simmat = mmr_matrices(qvec, cand_ids, cand_mat)
    return mmr_greedy(ids, rel, simmat, k, lam)


def mmr_matrices(qvec: np.ndarray, cand_ids: np.ndarray,
                 cand_mat: np.ndarray):
    """The relevance / pairwise-similarity inputs of the MMR greedy,
    exposed separately so a caller can PERSIST them (the oracle replays
    the unrolled greedy over these exact doubles — parquet float64
    round-trips are exact, so engine and SQL argmax over bit-identical
    scores).  Candidates sort ascending-id here; returns
    (ids_sorted, rel, simmat)."""
    order = np.argsort(cand_ids, kind="stable")
    ids = cand_ids[order]
    x = cand_mat[order].astype(np.float64, copy=True)
    nrm = np.linalg.norm(x, axis=1)
    nrm[nrm == 0] = 1.0
    x /= nrm[:, None]
    q = np.asarray(qvec, dtype=np.float64)
    qn = np.linalg.norm(q)
    rel = x @ (q / (qn if qn else 1.0))
    simmat = x @ x.T
    return ids, rel, simmat


def mmr_greedy(ids: np.ndarray, rel: np.ndarray, simmat: np.ndarray,
               k: int, lam: float = 0.7) -> pd.DataFrame:
    """The greedy itself over precomputed matrices (see ``mmr_matrices``).
    Emitted mmr_score rounds half-AWAY-from-zero (utils.rounding) to match
    the DuckDB oracle's round()."""
    from searchengine_ray.utils.rounding import round6_half_away

    C = len(ids)
    k = min(k, C)
    chosen = np.zeros(C, dtype=bool)
    max_sim = np.full(C, -np.inf)
    out_id = np.empty(k, dtype=np.int64)
    out_sc = np.empty(k, dtype=np.float64)
    for r in range(k):
        score = lam * rel - np.where(np.isfinite(max_sim),
                                     (1.0 - lam) * max_sim, 0.0)
        score[chosen] = -np.inf
        j = int(np.argmax(score))
        chosen[j] = True
        out_id[r], out_sc[r] = ids[j], score[j]
        np.maximum(max_sim, simmat[:, j], out=max_sim)
    return pd.DataFrame({"rank": np.arange(k, dtype=np.int64),
                         "vec_id": out_id,
                         "mmr_score": round6_half_away(out_sc)})
