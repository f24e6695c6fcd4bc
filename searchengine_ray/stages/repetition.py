"""Repetition / duplicated-text scoring over a document corpus.

Two training-data quality signals (beyond the reference, per the task
brief's LLM-pipeline extensions; the reference's only repetition handling
is the crawl-side near-dup gate, ngrams.py:80-101):

- ``repetition_stats``: WITHIN-doc repetition (Gopher-style repetition
  rules, Rae et al. 2021 §A1.1 — "fraction of characters in the most
  common n-gram / in duplicated n-grams", re-expressed over tokens):
  per doc, the most-frequent-token share, the most-frequent-2-gram share
  and the duplicate-2-gram share.  MAP-ONLY — every signal is a function
  of one document, so the whole operator is one ``map_batches`` pass with
  zero shuffles at any corpus size.

- ``dup_window_stats``: CROSS-doc duplicated-substring fraction (the
  exact-substring-dedup signal of Lee et al. 2021, "Deduplicating
  Training Data Makes Language Models Better", reduced from span merging
  to the per-doc duplicated-window fraction a filter consumes): for every
  sliding k-token window position, does the window text occur in ≥ 2
  distinct documents?  Two all-to-alls, both over (hash, doc, count)
  partials that are already per-batch combined — never over raw window
  explosions: batch → (window_hash, doc, cnt) partials → co-shuffle by
  hash (distinct-doc flag per hash, per-doc partial sums inside the
  bucket) → pre_aggregate by doc.  Driver sees nothing doc- or
  window-scaled.

Both use the SQL-parity tokenizer (``stages/text.simple_tokens``
semantics) so DuckDB oracles can mirror them exactly; window identity is
a vectorized int64 polynomial over stable token hashes — any injective
identity works because both sides group independently and compare
per-doc counts (hash collisions are the usual 2^-64 caveat, same
contract as every hashed family here).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset

from searchengine_ray.functions.ngrams import stable_hash64
from searchengine_ray.stages.relational import bucketed_apply, pre_aggregate
from searchengine_ray.stages.text import simple_tokens

_MUL = np.int64(1000003)  # wraparound polynomial combine (int64 bits)


def _token_hash_arrays(texts, tokenize=simple_tokens):
    """Per-doc int64 token-hash arrays (positions kept, NOT a set)."""
    out = []
    for t in texts:
        toks = tokenize(t or "")
        out.append(np.fromiter((stable_hash64(w) for w in toks),
                               dtype=np.int64, count=len(toks)))
    return out


def repetition_batch(df: pd.DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> pd.DataFrame:
    """Per-doc repetition signals for one batch (vectorized after the
    per-doc tokenize+hash, which is the cost floor shared with every text
    stage here):

    - ``n_tokens``
    - ``top_token_frac``  = max token count / n_tokens        (0 if empty)
    - ``top_2gram_frac``  = max 2-gram count / (n_tokens - 1) (0 if < 2)
    - ``dup_2gram_frac``  = 1 - distinct 2-grams / (n_tokens - 1)

    Counting runs on flat hash arrays with one pandas groupby per batch —
    no per-doc Python beyond tokenization."""
    ids = df[id_col].to_numpy()
    arrs = _token_hash_arrays(df[text_col])
    lens = np.fromiter((a.size for a in arrs), dtype=np.int64,
                       count=len(arrs))
    n_docs = len(arrs)
    top_tok = np.zeros(n_docs, dtype=np.float64)
    top_bg = np.zeros(n_docs, dtype=np.float64)
    dup_bg = np.zeros(n_docs, dtype=np.float64)
    if n_docs and lens.sum():
        flat = np.concatenate([a for a in arrs if a.size] or
                              [np.array([], dtype=np.int64)])
        parents = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        tok_df = pd.DataFrame({"p": parents, "h": flat})
        counts = tok_df.groupby(["p", "h"], sort=False).size()
        mx = counts.groupby(level=0, sort=False).max()
        top_tok[mx.index.to_numpy()] = (
            mx.to_numpy(dtype=np.float64)
            / lens[mx.index.to_numpy()].astype(np.float64))
        # 2-grams: combine adjacent hashes where both positions belong to
        # the same doc (vectorized wraparound polynomial, no strings built)
        if flat.size >= 2:
            same = parents[:-1] == parents[1:]
            if same.any():
                bg = flat[:-1] * _MUL + flat[1:]
                bdf = pd.DataFrame({"p": parents[:-1][same], "h": bg[same]})
                bc = bdf.groupby(["p", "h"], sort=False).size()
                per_doc = bc.groupby(level=0, sort=False)
                bmx, bdist = per_doc.max(), per_doc.size()
                docs = bmx.index.to_numpy()
                denom = (lens[docs] - 1).astype(np.float64)
                top_bg[docs] = bmx.to_numpy(dtype=np.float64) / denom
                dup_bg[docs] = 1.0 - bdist.to_numpy(np.float64) / denom
    return pd.DataFrame({
        "doc_id": ids.astype(np.int64),
        "n_tokens": lens,
        "top_token_frac": np.round(top_tok, 6),
        "top_2gram_frac": np.round(top_bg, 6),
        "dup_2gram_frac": np.round(dup_bg, 6),
    })


def repetition_stats(ds: Dataset, text_col: str = "text",
                     id_col: str = "doc_id",
                     batch_size: int = 1024) -> Dataset:
    """Within-doc repetition signals — map-only, zero shuffles."""
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return repetition_batch(df, text_col, id_col)

    return ds.map_batches(fn, batch_format="pandas", batch_size=batch_size)


# --- cross-doc duplicated-window fraction -----------------------------------

DEFAULT_WINDOW_K = 8


# per-worker token→hash cache (Zipf ⇒ high hit rate; module import is
# once per worker process — the minhash/simhash workspace discipline)
_TOKEN_HASH_CACHE: dict[str, int] = {}
_TOKEN_HASH_CAP = 500_000


def _hash_tokens(toks: list[str]) -> np.ndarray:
    cache = _TOKEN_HASH_CACHE
    out = np.empty(len(toks), dtype=np.int64)
    for i, t in enumerate(toks):
        h = cache.get(t)
        if h is None:
            h = stable_hash64(t)
            if len(cache) < _TOKEN_HASH_CAP:
                cache[t] = h
        out[i] = h
    return out


def window_hash_counts(texts, ids, k: int) -> pd.DataFrame:
    """One batch → per-(window_hash, doc) POSITION counts.

    Window identity = an int64 wraparound polynomial over the k token
    hashes — injective up to the usual 2^-64 collision caveat, which is
    all the operator needs: the oracle compares per-doc COUNTS of
    duplicated window positions, and both sides group by window identity
    independently (SQL groups the space-joined string).  The polynomial
    is VECTORIZED across the whole batch: one flat token-hash array, k
    shifted-slice multiply-adds, a parent mask to kill windows straddling
    doc boundaries — no per-window Python, no per-window blake2b."""
    empty = pd.DataFrame({"h": pd.Series([], dtype=np.int64),
                          "doc_id": pd.Series([], dtype=np.int64),
                          "cnt": pd.Series([], dtype=np.int64)})
    tok_arrays, doc_ids, lens = [], [], []
    for doc_id, text in zip(ids, texts):
        toks = simple_tokens(text or "")
        if len(toks) >= k:
            tok_arrays.append(_hash_tokens(toks))
            doc_ids.append(doc_id)
            lens.append(len(toks))
    if not tok_arrays:
        return empty
    lens = np.asarray(lens, dtype=np.int64)
    flat = np.concatenate(tok_arrays)
    parents = np.repeat(np.arange(len(tok_arrays), dtype=np.int64), lens)
    m = flat.size - k + 1
    w = np.zeros(m, dtype=np.int64)
    for j in range(k):  # wraparound polynomial, int64 bits
        w = w * _MUL + flat[j:j + m]
    valid = parents[:m] == parents[k - 1:]
    w, p = w[valid], parents[:m][valid]
    df = (pd.DataFrame({"h": w, "p": p})
          .groupby(["p", "h"], sort=False).size().reset_index(name="cnt"))
    return pd.DataFrame({
        "h": df["h"].to_numpy(np.int64),
        "doc_id": np.asarray(doc_ids, dtype=np.int64)[df["p"].to_numpy()],
        "cnt": df["cnt"].to_numpy(np.int64)})


def dup_window_stats(ds: Dataset, k: int = DEFAULT_WINDOW_K,
                     text_col: str = "text", id_col: str = "doc_id",
                     batch_size: int = 1024) -> Dataset:
    """Per doc: (n_windows, n_dup_windows, dup_frac) where a window
    position is "dup" iff its window text occurs in ≥ 2 DISTINCT docs.

    Scale shape: stage 1 emits per-batch-combined (h, doc, cnt) partials;
    stage 2 co-shuffles by ``h`` so each hash's full doc set is local to
    one bucket — the multi-doc flag and the per-doc partial sums are one
    vectorized groupby there; stage 3 is a tiny pre_aggregate keyed by
    doc.  Docs with fewer than k tokens have no windows and are absent
    from the output (mirrored by the oracle's ``len(ts) >= k``)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return window_hash_counts(df[text_col], df[id_col].to_numpy(), k)

    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=batch_size)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "dup": pd.Series([], dtype=np.int64),
                                 "tot": pd.Series([], dtype=np.int64)})
        # combine cross-batch partials for the same (h, doc)
        gg = g.groupby(["h", "doc_id"], sort=False, as_index=False)["cnt"].sum()
        nd = gg.groupby("h", sort=False)["doc_id"].transform("size")
        dup = np.where(nd.to_numpy() >= 2, gg["cnt"].to_numpy(), 0)
        out = pd.DataFrame({"doc_id": gg["doc_id"], "dup": dup,
                            "tot": gg["cnt"]})
        return out.groupby("doc_id", sort=False, as_index=False).sum()

    per_doc = bucketed_apply(partials, ["h"], per_bucket)
    agg = pre_aggregate(per_doc, ["doc_id"],
                        {"n_dup_windows": ("dup", "sum"),
                         "n_windows": ("tot", "sum")})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype(np.int64),
            "n_windows": df["n_windows"].astype(np.int64),
            "n_dup_windows": df["n_dup_windows"].astype(np.int64),
            "dup_frac": (df["n_dup_windows"] / df["n_windows"]).round(6),
        })

    return agg.map_batches(finish, batch_format="pandas")
