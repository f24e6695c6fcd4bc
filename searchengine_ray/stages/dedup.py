"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Exact dedup (reference D3 — ``utils/__init__.py:25-30``, ``README.md:166-168``)
is hash-partition + per-group first.  Near-dup families replace the
reference's O(N²) global scan (``ngrams.py:88-101``) with banded-LSH
candidate generation + exact verification (SURVEY.md §7 hard part 2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
from ray.data import Dataset

from searchengine_ray.functions.minhash import band_keys, make_coeffs, minhash_signature
from searchengine_ray.functions.ngrams import shingle_hashes, stable_hash64
from searchengine_ray.functions.phash import hamming64, phash_bands
from searchengine_ray.functions.simhash import simhash64
from searchengine_ray.stages.text import simple_tokens


def add_content_hash(ds: Dataset, text_col: str = "text", out_col: str = "content_hash") -> Dataset:
    """Stable 64-bit content hash column (vectorized-per-batch)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df[out_col] = np.fromiter(
            (stable_hash64(t or "") for t in df[text_col]), dtype=np.int64, count=len(df)
        )
        return df

    return ds.map_batches(fn, batch_format="pandas")


def dedup_exact(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> Dataset:
    """Keep the min-id row per distinct content.  Order-independent (min id),
    so it needs no sequential state — unlike the reference's arrival-order
    seen set, the keep-set is identical (min doc_id ↔ first arrival for
    monotonically assigned ids).

    Shuffle shape: the content hash is near-unique, so per-group machinery
    (native ``groupby.map_groups`` — or even a per-group Python fn) is the
    many-tiny-groups pathology.  ``bucketed_apply`` runs ONE vectorized
    ``sort + drop_duplicates`` per hash bucket instead."""
    from searchengine_ray.stages.relational import bucketed_apply

    hashed = add_content_hash(ds, text_col=text_col)

    def keep_min_id(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(id_col, kind="mergesort")
                .drop_duplicates("content_hash", keep="first"))

    return bucketed_apply(hashed, ["content_hash"], keep_min_id)


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------


class MinHashStage:
    """doc → (signature bands) rows.  Coefficients built once per actor."""

    def __init__(self, num_perm: int = 128, num_bands: int = 16, shingle_n: int = 3,
                 text_col: str = "text", id_col: str = "doc_id"):
        self.a, self.b = make_coeffs(num_perm)
        self.num_bands = num_bands
        self.shingle_n = shingle_n
        self.text_col = text_col
        self.id_col = id_col

    def signature(self, text: str) -> np.ndarray:
        sh = shingle_hashes(simple_tokens(text), self.shingle_n)
        return minhash_signature(np.fromiter(sh, dtype=np.int64, count=len(sh)), self.a, self.b)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids, bands, digests = [], [], []
        for doc_id, text in zip(df[self.id_col].to_numpy(), df[self.text_col]):
            sig = self.signature(text or "")
            for band_id, digest in band_keys(sig, self.num_bands):
                ids.append(doc_id)
                bands.append(band_id)
                digests.append(digest)
        return pd.DataFrame(
            {"doc_id": np.array(ids, dtype=np.int64),
             "band_id": np.array(bands, dtype=np.int32),
             "band_digest": np.array(digests, dtype=np.int64)}
        )


def minhash_lsh_candidates(
    ds: Dataset, num_perm: int = 128, num_bands: int = 16,
    text_col: str = "text", id_col: str = "doc_id",
) -> Dataset:
    """Candidate near-dup pairs (doc_a < doc_b) sharing ≥1 LSH band bucket.

    shingle → minhash → band → ``groupby(band)`` → per-bucket pairing —
    the all-to-all is over tiny (band, digest, id) rows, never documents."""
    bands = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={"num_perm": num_perm, "num_bands": num_bands,
                               "text_col": text_col, "id_col": id_col},
        batch_format="pandas", batch_size=1024, concurrency=(1, 8),
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["doc_id"].to_numpy())
        if ids.size < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype(np.int64)
        ia, ib = np.triu_indices(ids.size, k=1)
        return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})

    from searchengine_ray.stages.relational import bucketed_map_groups

    cand = bucketed_map_groups(bands, ["band_id", "band_digest"], pairs,
                               skip_singletons=True)
    # dedup pairs discovered in multiple bands
    return bucketed_map_groups(cand, ["doc_a", "doc_b"], lambda g: g.head(1))


def verify_jaccard_pairs(
    ds: Dataset, pairs: Dataset, threshold: float, shingle_n: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
) -> pd.DataFrame:
    """Exact-Jaccard verification of candidate pairs.  The candidate set is
    small (LSH output); shingle sets for the involved docs are collected via
    a semi-filter and the verify runs driver-side on fingerprints only."""
    pdf = pairs.to_pandas()
    need = set(pdf["doc_a"]).union(pdf["doc_b"])
    need_ref = ray.put(need)

    def shingles_of(df: pd.DataFrame) -> pd.DataFrame:
        keep = df[df[id_col].isin(ray.get(need_ref))]
        return pd.DataFrame({
            "doc_id": keep[id_col].to_numpy(),
            "sh": [list(shingle_hashes(simple_tokens(t or ""), shingle_n)) for t in keep[text_col]],
        })

    fp = ds.map_batches(shingles_of, batch_format="pandas").to_pandas()
    sets = {d: set(s) for d, s in zip(fp["doc_id"], fp["sh"])}
    out = []
    for a, b in zip(pdf["doc_a"], pdf["doc_b"]):
        sa, sb = sets.get(a, set()), sets.get(b, set())
        union = sa | sb
        j = (len(sa & sb) / len(union)) if union else 0.0
        if j > threshold:
            out.append((a, b, j))
    return pd.DataFrame(out, columns=["doc_a", "doc_b", "jaccard"]).astype(
        {"doc_a": np.int64, "doc_b": np.int64}
    )


def ngram_jaccard_pairs(
    ds: Dataset, threshold: float = 0.65, shingle_n: int = 3,
    text_col: str = "text", id_col: str = "doc_id", round_to: int = 6,
) -> Dataset:
    """EXACT all-pairs n-gram Jaccard dedup, distributed.

    Any pair with Jaccard > 0 shares ≥1 shingle, so: explode
    (doc, shingle_hash) → ``groupby(shingle)`` emits co-occurring pairs →
    ``groupby(pair)`` counts shared shingles → jaccard =
    shared/(|A|+|B|-shared) with broadcast per-doc set sizes.  No pairwise
    scan ever touches non-overlapping docs — the distributed form of the
    reference's O(N²) loop (ngrams.py:88-101) with identical results."""

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ids, hs = [], []
        for doc_id, text in zip(df[id_col].to_numpy(), df[text_col]):
            for v in shingle_hashes(simple_tokens(text or ""), shingle_n):
                ids.append(doc_id)
                hs.append(v)
        return pd.DataFrame({"doc_id": np.array(ids, np.int64),
                             "sh": np.array(hs, np.int64)})

    exploded = ds.map_batches(explode, batch_format="pandas", batch_size=1024)

    # per-doc set sizes (small) → broadcast
    sizes_df = exploded.map_batches(
        lambda df: df.groupby("doc_id", as_index=False).agg(n=("sh", "size")),
        batch_format="pandas",
    ).to_pandas().groupby("doc_id", as_index=False)["n"].sum()
    sizes = dict(zip(sizes_df["doc_id"], sizes_df["n"]))
    sizes_ref = ray.put(sizes)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["doc_id"].to_numpy())
        if ids.size < 2:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                                 "doc_b": pd.Series([], dtype=np.int64)})
        ia, ib = np.triu_indices(ids.size, k=1)
        return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})

    from searchengine_ray.stages.relational import bucketed_map_groups, pre_aggregate

    pair_rows = bucketed_map_groups(exploded, ["sh"], pairs, skip_singletons=True)
    # shared-shingle count per pair (pre-aggregated), then one vectorized
    # jaccard pass with broadcast set sizes — no per-pair python
    counted = pre_aggregate(pair_rows, ["doc_a", "doc_b"],
                            {"shared": (None, "count")})

    def jaccard_batch(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                                 "doc_b": pd.Series([], dtype=np.int64),
                                 "jaccard": pd.Series([], dtype=np.float64)})
        sz = ray.get(sizes_ref)
        na = df["doc_a"].map(sz).to_numpy(dtype=np.float64)
        nb = df["doc_b"].map(sz).to_numpy(dtype=np.float64)
        shared = df["shared"].to_numpy(dtype=np.float64)
        j = shared / (na + nb - shared)
        keep = j > threshold
        return pd.DataFrame({"doc_a": df["doc_a"].to_numpy()[keep],
                             "doc_b": df["doc_b"].to_numpy()[keep],
                             "jaccard": np.round(j[keep], round_to)})

    return counted.map_batches(jaccard_batch, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------


def add_simhash(ds: Dataset, text_col: str = "text") -> Dataset:
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df["simhash"] = np.fromiter(
            (simhash64(simple_tokens(t or "")) for t in df[text_col]),
            dtype=np.int64, count=len(df),
        )
        return df

    return ds.map_batches(fn, batch_format="pandas", batch_size=1024)


def simhash_neardup_pairs(ds: Dataset, max_hamming: int = 3,
                          text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """Pairs within Hamming ≤ t via pigeonhole banding ((t+1) bands ⇒ exact
    recall) + per-bucket verification."""
    num_bands = max_hamming + 1
    hashed = add_simhash(ds, text_col=text_col).select_columns([id_col, "simhash"])

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ids, bands, vals, hs = [], [], [], []
        for i, h in zip(df[id_col].to_numpy(), df["simhash"].to_numpy()):
            for band_id, bv in phash_bands(int(h), num_bands):
                ids.append(i); bands.append(band_id); vals.append(bv); hs.append(h)
        return pd.DataFrame({"doc_id": np.array(ids, np.int64),
                             "band_id": np.array(bands, np.int32),
                             "band_val": np.array(vals, np.int64),
                             "simhash": np.array(hs, np.int64)})

    bands = hashed.map_batches(explode, batch_format="pandas")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = g["doc_id"].to_numpy(); hs = g["simhash"].to_numpy()
        out = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if hamming64(int(hs[i]), int(hs[j])) <= max_hamming:
                    out.append((ids[i], ids[j]))
        return pd.DataFrame(out, columns=["doc_a", "doc_b"]).astype(np.int64)

    from searchengine_ray.stages.relational import bucketed_map_groups

    cand = bucketed_map_groups(bands, ["band_id", "band_val"], pairs,
                               skip_singletons=True)
    return bucketed_map_groups(cand, ["doc_a", "doc_b"], lambda g: g.head(1))


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(
    ds: Dataset, threshold: float = 0.95, id_col: str = "vec_id",
    emb_col: str = "embedding", num_buckets: int = 8, seed: int = 13,
) -> Dataset:
    """Near-dup pairs with cosine ≥ threshold via random-hyperplane LSH
    (sign buckets) + within-bucket exact cosine.  Multi-probe: (t+1)-style
    banding over two independent hyperplane sets keeps recall high for
    cos ≥ 0.95; exact for identical vectors."""
    def explode(df: pd.DataFrame) -> pd.DataFrame:
        emb = np.stack([np.asarray(e, dtype=np.float64) for e in df[emb_col]])
        p_rng = np.random.RandomState(seed)  # same planes in every task
        planes = [p_rng.randn(emb.shape[1], 6) for _ in range(num_buckets)]
        ids, bands, vals, vecs = [], [], [], []
        for r in range(emb.shape[0]):
            v = emb[r]
            for band_id, pl in enumerate(planes):
                bits = (v @ pl > 0).astype(np.int64)
                key = int((bits * (1 << np.arange(bits.size))).sum())
                ids.append(df[id_col].iloc[r]); bands.append(band_id)
                vals.append(key); vecs.append(v.tolist())
        return pd.DataFrame({"vec_id": np.array(ids, np.int64),
                             "band_id": np.array(bands, np.int32),
                             "band_val": np.array(vals, np.int64),
                             "vec": vecs})

    bands = ds.map_batches(explode, batch_format="pandas", batch_size=1024)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("vec_id").sort_values("vec_id")
        if len(g) < 2:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                                 "doc_b": pd.Series([], dtype=np.int64),
                                 "cosine": pd.Series([], dtype=np.float64)})
        m = np.stack([np.asarray(v) for v in g["vec"]])
        norms = np.linalg.norm(m, axis=1); norms[norms == 0] = 1.0
        sims = (m @ m.T) / np.outer(norms, norms)
        ids = g["vec_id"].to_numpy()
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= threshold
        return pd.DataFrame({"doc_a": ids[ia][keep], "doc_b": ids[ib][keep],
                             "cosine": sims[ia, ib][keep]})

    from searchengine_ray.stages.relational import bucketed_map_groups

    cand = bucketed_map_groups(bands, ["band_id", "band_val"], pairs,
                               skip_singletons=True)
    return bucketed_map_groups(cand, ["doc_a", "doc_b"], lambda g: g.head(1))
