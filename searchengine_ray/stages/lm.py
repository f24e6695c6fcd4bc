"""N-gram language-model perplexity scoring (the CCNet quality filter).

CCNet (Wenzek et al. 2020) scores every crawled document by the
perplexity of a KenLM n-gram model trained on a small high-quality
reference corpus, then buckets the corpus by that score — the most-used
model-based quality signal in web-scale training-data pipelines.  The
env ships no KenLM, so the model here is a real add-one-smoothed BIGRAM
LM trained by the operator itself (the reference repo has no analog;
this is a task-brief training-data extension like ``stages/decontam``).

Scale shape — the whole point of the CCNet design:

- TRAIN side is a small bounded reference corpus (CCNet uses Wikipedia).
  ``train_bigram_lm`` makes one distributed counting pass
  (``pre_aggregate`` over per-batch-combined partials) and pulls the
  model to the driver as four compact sorted numpy arrays.  The pull is
  O(model), NOT O(corpus) — and is guarded by ``max_model_rows`` so a
  caller who points it at an unbounded corpus gets an error, not an OOM.
- SCORE side is MAP-ONLY at any corpus size: the model broadcasts once
  via ``ray.put`` and every batch resolves token/bigram counts with two
  vectorized ``np.searchsorted`` probes — zero shuffles, zero driver
  work, nothing corpus-scaled anywhere.

Token/bigram identity is the stable int64 hash family every text op here
shares (``stable_hash64`` + the wraparound-polynomial combine), so a
DuckDB oracle that joins on token STRINGS mirrors the math exactly (the
usual 2^-64 collision caveat).

Model: p(cur | prev) = (c(prev,cur) + 1) / (c(prev) + V), with V =
|train vocab| + 1 (the +1 is the OOV bucket; unseen prev ⇒ c(prev)=0).
Per-doc score = -mean(ln p) over the doc's bigram positions — docs with
< 2 tokens have no bigrams and are absent from the output (mirrored by
the oracle's ``len(ts) >= 2``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
from ray.data import Dataset

from searchengine_ray.stages.repetition import _MUL, _hash_tokens
from searchengine_ray.stages.text import simple_tokens


class BigramLM:
    """Compact broadcastable model: sorted hash arrays + counts."""

    __slots__ = ("uni_h", "uni_c", "bg_h", "bg_c", "vocab_plus_oov")

    def __init__(self, uni: pd.DataFrame, bg: pd.DataFrame):
        u = uni.sort_values("h")
        b = bg.sort_values("h")
        self.uni_h = np.ascontiguousarray(u["h"].to_numpy(np.int64))
        self.uni_c = np.ascontiguousarray(u["c"].to_numpy(np.int64))
        self.bg_h = np.ascontiguousarray(b["h"].to_numpy(np.int64))
        self.bg_c = np.ascontiguousarray(b["c"].to_numpy(np.int64))
        self.vocab_plus_oov = int(self.uni_h.size) + 1

    def lookup(self, arr: np.ndarray, keys: np.ndarray,
               counts: np.ndarray) -> np.ndarray:
        """Vectorized count lookup: 0 for absent keys."""
        if not keys.size or not arr.size:
            return np.zeros(keys.size, dtype=np.int64)
        idx = np.searchsorted(arr, keys)
        idx[idx == arr.size] = 0
        hit = arr[idx] == keys
        out = np.where(hit, counts[idx], 0)
        return out.astype(np.int64)


def _batch_bigrams(texts, ids):
    """Flat (prev_hash, cur_hash, parent) arrays for one batch — shares
    the token-hash cache with the window ops; doc-boundary pairs masked."""
    z = np.array([], dtype=np.int64)
    tok_arrays, doc_ids, lens = [], [], []
    for doc_id, text in zip(ids, texts):
        toks = simple_tokens(text or "")
        if len(toks) >= 2:
            tok_arrays.append(_hash_tokens(toks))
            doc_ids.append(doc_id)
            lens.append(len(toks))
    if not tok_arrays:
        return z, z, z, np.array([], dtype=np.int64)
    lens = np.asarray(lens, dtype=np.int64)
    flat = np.concatenate(tok_arrays)
    parents = np.repeat(np.arange(len(tok_arrays), dtype=np.int64), lens)
    same = parents[:-1] == parents[1:]
    prev, cur = flat[:-1][same], flat[1:][same]
    return prev, cur, parents[:-1][same], np.asarray(doc_ids, dtype=np.int64)


DEFAULT_MAX_MODEL_ROWS = 50_000_000  # ~1.6 GB of model arrays — a driver
# bound for misuse, far above any sane reference corpus (CCNet's Wikipedia
# models are tens of millions of n-grams)


def train_bigram_lm(train: Dataset, text_col: str = "text",
                    id_col: str = "doc_id",
                    max_model_rows: int = DEFAULT_MAX_MODEL_ROWS,
                    batch_size: int = 1024) -> BigramLM:
    """One distributed counting pass over the (small) reference corpus →
    driver-side compact model.  The pull is O(model) with a hard cap."""
    from searchengine_ray.stages.relational import pre_aggregate

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        prev, cur, _, _ = _batch_bigrams(df[text_col],
                                         df[id_col].to_numpy())
        # unigram counts must cover every token, including doc-final ones
        # and 1-token docs: re-derive from the raw token stream
        onecol = []
        for t in df[text_col]:
            toks = simple_tokens(t or "")
            if toks:
                onecol.append(_hash_tokens(toks))
        uni = (np.concatenate(onecol) if onecol
               else np.array([], dtype=np.int64))
        bg = prev * _MUL + cur
        return pd.DataFrame({
            "h": np.concatenate([uni, bg]),
            "kind": np.concatenate([
                np.zeros(uni.size, dtype=np.int8),
                np.ones(bg.size, dtype=np.int8)])})

    counts = pre_aggregate(
        train.map_batches(explode, batch_format="pandas",
                          batch_size=batch_size),
        ["kind", "h"], {"c": (None, "count")})
    df = counts.to_pandas()  # O(model): bounded reference corpus by contract
    if len(df) > max_model_rows:
        raise ValueError(
            f"bigram LM model has {len(df)} rows > max_model_rows="
            f"{max_model_rows}: the train side must be a bounded "
            f"reference corpus (CCNet trains on Wikipedia, not the crawl)")
    kind = df["kind"].to_numpy()
    return BigramLM(df[kind == 0][["h", "c"]], df[kind == 1][["h", "c"]])


def lm_perplexity(ds: Dataset, model: BigramLM, text_col: str = "text",
                  id_col: str = "doc_id",
                  batch_size: int = 1024) -> Dataset:
    """Score every doc with ≥ 2 tokens: ``(doc_id, n_bigrams, logppl)``
    where logppl = round(-mean(ln p(cur|prev)), 6).  Map-only — the model
    rides the object store once (``ray.put``) and each batch is two
    searchsorted probes + one grouped mean."""
    model_ref = ray.put(model)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        m: BigramLM = ray.get(model_ref)
        prev, cur, parent, doc_ids = _batch_bigrams(
            df[text_col], df[id_col].to_numpy())
        if not prev.size:
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype=np.int64),
                "n_bigrams": pd.Series([], dtype=np.int64),
                "logppl": pd.Series([], dtype=np.float64)})
        c_prev = m.lookup(m.uni_h, prev, m.uni_c)
        c_bg = m.lookup(m.bg_h, prev * _MUL + cur, m.bg_c)
        lp = np.log((c_bg + 1.0) / (c_prev + float(m.vocab_plus_oov)))
        sums = np.zeros(doc_ids.size, dtype=np.float64)
        cnts = np.zeros(doc_ids.size, dtype=np.int64)
        np.add.at(sums, parent, lp)
        np.add.at(cnts, parent, 1)
        return pd.DataFrame({
            "doc_id": doc_ids,
            "n_bigrams": cnts,
            "logppl": np.round(-(sums / cnts), 6)})

    return ds.map_batches(score, batch_format="pandas",
                          batch_size=batch_size)
