"""Deterministic document-embedding inference stage.

The MODEL-SCORING pattern of a training-data pipeline: a stateful stage
that loads weights once per worker and runs batched inference per batch —
here with a deterministic stand-in model (the task environment has no
embedding libraries; per the brief, the plumbing is real and the model is
a reproducible fake): feature hashing (Weinberger et al. 2009, the
"hashing trick") of tokens into B buckets using the reference's
``custom_string_hash`` (sum of ords — ngrams.py:20-25, kept for parity
and SQL-expressibility), then a fixed projection W[b, d] = sin(31·b +
7·(d+1)).

Everything is map-only: weights build once per worker process, token →
bucket lookups cache per worker (Zipf), and each batch reduces to ONE
(docs × buckets) count matrix matmul.  The output feeds the existing
embedding consumers (knn / semantic dedup / embedding-LSH) when no
pretrained vectors exist.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset

from searchengine_ray.stages.text import simple_tokens

N_BUCKETS = 257
EMBED_DIM = 4


def projection_matrix(n_buckets: int = N_BUCKETS,
                      dim: int = EMBED_DIM) -> np.ndarray:
    b = np.arange(n_buckets, dtype=np.float64)[:, None]
    d = np.arange(1, dim + 1, dtype=np.float64)[None, :]
    return np.sin(b * 31.0 + d * 7.0)


class HashedEmbedder:
    """Actor-pool inference stage: weights + token cache built ONCE per
    actor (__init__), batched vectorized inference per __call__."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 cache_cap: int = 500_000):
        self.text_col = text_col
        self.id_col = id_col
        self.W = projection_matrix()
        self.cache: dict[str, int] = {}
        self.cache_cap = cache_cap

    def _bucket(self, tok: str) -> int:
        b = self.cache.get(tok)
        if b is None:
            b = sum(ord(c) for c in tok) % N_BUCKETS
            if len(self.cache) < self.cache_cap:
                self.cache[tok] = b
        return b

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        counts = np.zeros((n, N_BUCKETS), dtype=np.float64)
        n_tokens = np.zeros(n, dtype=np.int64)
        for i, text in enumerate(df[self.text_col]):
            toks = simple_tokens(text or "")
            n_tokens[i] = len(toks)
            if toks:
                bk = np.fromiter((self._bucket(t) for t in toks),
                                 dtype=np.int64, count=len(toks))
                np.add.at(counts[i], bk, 1.0)
        emb = counts @ self.W  # one matmul serves the whole batch
        keep = n_tokens > 0
        out = {"doc_id": df[self.id_col].to_numpy(np.int64)[keep],
               "n_tokens": n_tokens[keep]}
        for d in range(EMBED_DIM):
            out[f"emb_{d}"] = np.round(emb[keep, d], 6)
        return pd.DataFrame(out)


def embed_documents(ds: Dataset, text_col: str = "text",
                    id_col: str = "doc_id",
                    batch_size: int = 1024) -> Dataset:
    """(doc_id, n_tokens, emb_0..emb_3) per token-bearing doc — map-only."""
    return ds.map_batches(
        HashedEmbedder, fn_constructor_kwargs={"text_col": text_col,
                                               "id_col": id_col},
        batch_format="pandas", batch_size=batch_size, concurrency=(1, 4))
