"""Bigram collocation mining: pointwise mutual information over adjacent
token pairs (Church & Hanks 1990) — the phrase/stopword-discovery pass a
training-data pipeline runs before tokenizer training.

Scale shape: bigram and unigram counts both flow through ``pre_aggregate``
(map-side combine, one all-to-all each, outputs vocabulary-bounded).  PMI
attaches the unigram counts to the bigram table either by broadcast (one
``ray.put`` of the O(vocab) dict, map-only) or — above
``broadcast_vocab_limit``, where a web-scale vocabulary does not belong
on the driver — via two distributed ``hash_join`` co-shuffles (one per
endpoint).  Both paths are pinned identical by tests.

Numeric contract (the oracle-hash discipline): pmi =
``ln(double(N·c_xy) / double(c_x·c_y))`` with both products computed in
int64 and cast once — engine and DuckDB then round the SAME double to 6
decimals.  Guarded: raises if ``N·max(c_xy)`` or ``max(c_x)²`` would
overflow int64 (at that scale pre-scale the counts instead).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
from ray.data import Dataset

from searchengine_ray.stages.relational import (
    global_topk, hash_join, pre_aggregate)
from searchengine_ray.stages.text import simple_tokens


class BigramExplode:
    """Per-batch adjacent-pair explode with per-batch combine (one output
    row per distinct pair per batch, not per occurrence)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        a_all, b_all = [], []
        for text in df[self.text_col]:
            toks = simple_tokens(text or "")
            if len(toks) >= 2:
                a_all.extend(toks[:-1])
                b_all.extend(toks[1:])
        if not a_all:
            return pd.DataFrame({"tok_a": pd.Series([], dtype=object),
                                 "tok_b": pd.Series([], dtype=object),
                                 "n_pair": pd.Series([], dtype=np.int64)})
        out = (pd.DataFrame({"tok_a": a_all, "tok_b": b_all})
               .groupby(["tok_a", "tok_b"], sort=False).size()
               .reset_index(name="n_pair"))
        out["n_pair"] = out["n_pair"].astype(np.int64)
        return out


def bigram_counts(docs: Dataset, text_col: str = "text") -> Dataset:
    """Corpus-wide (tok_a, tok_b, n_pair) — n_pair counts OCCURRENCES."""
    exploded = docs.map_batches(BigramExplode(text_col),
                                batch_format="pandas", batch_size=2048)
    return pre_aggregate(exploded, ["tok_a", "tok_b"],
                         {"n_pair": ("n_pair", "sum")})


def unigram_counts(docs: Dataset, text_col: str = "text") -> Dataset:
    """Corpus-wide (token, c) occurrence counts (NOT document frequency)."""

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        for text in df[text_col]:
            toks.extend(simple_tokens(text or ""))
        out = (pd.DataFrame({"token": toks}).groupby("token", sort=False)
               .size().reset_index(name="c"))
        out["c"] = out["c"].astype(np.int64)
        return out

    exploded = docs.map_batches(explode, batch_format="pandas",
                                batch_size=2048)
    return pre_aggregate(exploded, ["token"], {"c": ("c", "sum")})


def _attach_and_score(df: pd.DataFrame, n_bigrams: int,
                      round_to: int) -> pd.DataFrame:
    n = df["n_pair"].to_numpy(np.int64)
    ca = df["ca"].to_numpy(np.int64)
    cb = df["cb"].to_numpy(np.int64)
    if n.size:
        if int(n.max()) > (2**63 - 1) // max(n_bigrams, 1):
            raise OverflowError("N·c_xy overflows int64 — pre-scale counts")
        if int(max(ca.max(), cb.max())) > int(np.sqrt(2**63 - 1)):
            raise OverflowError("c_x·c_y overflows int64 — pre-scale counts")
    num = (np.int64(n_bigrams) * n).astype(np.float64)
    den = (ca * cb).astype(np.float64)
    pmi = np.log(num / den) if n.size else np.empty(0)
    return pd.DataFrame({"tok_a": df["tok_a"].to_numpy(),
                         "tok_b": df["tok_b"].to_numpy(),
                         "n_pair": n,
                         "pmi": np.round(pmi, round_to)})


def bigram_pmi(docs: Dataset, min_count: int = 5, k: int = 100,
               round_to: int = 6, text_col: str = "text",
               broadcast_vocab_limit: int = 2_000_000) -> pd.DataFrame:
    """Top-k collocations by (rounded pmi desc, tok_a, tok_b) among pairs
    with ``n_pair ≥ min_count``.  Ordering uses the ROUNDED score so
    boundary ties cannot diverge from the SQL mirror."""
    big = bigram_counts(docs, text_col).materialize()
    n_bigrams = int(big.sum("n_pair") or 0)
    if n_bigrams == 0:
        return pd.DataFrame({"tok_a": [], "tok_b": [], "n_pair": [],
                             "pmi": []})
    uni = unigram_counts(docs, text_col).materialize()
    # map-side threshold (vectorized; ds.filter is per-row Python)
    filtered = big.map_batches(
        lambda df: df[df["n_pair"] >= min_count],
        batch_format="pandas")

    if uni.count() <= broadcast_vocab_limit:
        utbl = uni.to_pandas()  # bounded: O(vocab) ≤ broadcast_vocab_limit
        cmap = dict(zip(utbl["token"], utbl["c"].astype(np.int64)))
        cref = ray.put(cmap)

        def attach(df: pd.DataFrame) -> pd.DataFrame:
            table = ray.get(cref)  # plasma-local
            out = df.copy()
            out["ca"] = np.array([table[t] for t in df["tok_a"]],
                                 dtype=np.int64)
            out["cb"] = np.array([table[t] for t in df["tok_b"]],
                                 dtype=np.int64)
            return _attach_and_score(out, n_bigrams, round_to)

        scored = filtered.map_batches(attach, batch_format="pandas")
    else:
        import pyarrow as pa

        # hash_join reads Arrow schemas off both sides — re-block the
        # pandas-built inputs as Arrow tables first
        def _arrow(names):
            def fn(t: pa.Table) -> pa.Table:
                return t.rename_columns(names)
            return fn

        filt_a = filtered.map_batches(
            _arrow(["tok_a", "tok_b", "n_pair"]), batch_format="pyarrow")
        uni_a = uni.map_batches(_arrow(["tok_a", "ca"]),
                                batch_format="pyarrow")
        uni_b = uni.map_batches(_arrow(["tok_b", "cb"]),
                                batch_format="pyarrow")
        j1 = hash_join(filt_a, uni_a, on="tok_a")
        j2 = hash_join(j1, uni_b, on="tok_b")
        scored = j2.map_batches(
            lambda df: _attach_and_score(df, n_bigrams, round_to),
            batch_format="pandas")

    return global_topk(scored.select_columns(
        ["tok_a", "tok_b", "n_pair", "pmi"]),
        ["pmi", "tok_a", "tok_b"], [False, True, True], k)
