"""Bigram PMI collocations vs a single-process brute force; broadcast and
distributed-join unigram attach pinned identical; threshold binding."""

import math
from collections import Counter

import numpy as np
import pandas as pd
import ray.data as rd

from searchengine_ray.stages.collocations import bigram_pmi
from searchengine_ray.stages.text import simple_tokens


def _docs():
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for i in range(150):
        toks = list(rng.choice(vocab, size=rng.integers(2, 40)))
        # plant a strong collocation so PMI has signal
        if i % 3 == 0:
            toks[0:2] = ["strong", "pair"]
        texts.append(" ".join(toks))
    texts.append("loner")          # <2 tokens: contributes no bigrams
    texts.append("")               # empty doc
    return pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                         "text": texts})


def _brute(docs: pd.DataFrame, min_count: int, k: int) -> pd.DataFrame:
    uni: Counter = Counter()
    big: Counter = Counter()
    n_bigrams = 0
    for t in docs["text"]:
        toks = simple_tokens(t or "")
        uni.update(toks)
        for a, b in zip(toks[:-1], toks[1:]):
            big[(a, b)] += 1
            n_bigrams += 1
    rows = []
    for (a, b), n in big.items():
        if n >= min_count:
            pmi = math.log(float(n_bigrams * n) / float(uni[a] * uni[b]))
            rows.append((a, b, n, round(pmi, 6)))
    out = pd.DataFrame(rows, columns=["tok_a", "tok_b", "n_pair", "pmi"])
    return (out.sort_values(["pmi", "tok_a", "tok_b"],
                            ascending=[False, True, True])
            .head(k).reset_index(drop=True))


def test_matches_bruteforce(ray_session):
    docs = _docs()
    ds = rd.from_pandas(docs).repartition(5)
    got = bigram_pmi(ds, min_count=3, k=50).reset_index(drop=True)
    want = _brute(docs, min_count=3, k=50)
    pd.testing.assert_frame_equal(
        got[["tok_a", "tok_b", "n_pair", "pmi"]].astype(
            {"n_pair": np.int64}),
        want.astype({"n_pair": np.int64}))
    # the planted collocation must rank first
    assert got.loc[0, ["tok_a", "tok_b"]].tolist() == ["strong", "pair"]


def test_join_path_matches_broadcast(ray_session):
    docs = _docs()
    ds = rd.from_pandas(docs).repartition(5)
    a = bigram_pmi(ds, min_count=3, k=50).reset_index(drop=True)
    b = bigram_pmi(ds, min_count=3, k=50,
                   broadcast_vocab_limit=0).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_min_count_binds(ray_session):
    docs = _docs()
    ds = rd.from_pandas(docs)
    loose = bigram_pmi(ds, min_count=1, k=10_000)
    tight = bigram_pmi(ds, min_count=4, k=10_000)
    assert len(tight) < len(loose)
    assert (tight["n_pair"] >= 4).all()


def test_empty_corpus(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"doc_id": [0], "text": ["one"]}))
    out = bigram_pmi(ds, min_count=1, k=10)
    assert len(out) == 0
