"""Anchor-text aggregation vs a single-process brute force (same closed
deterministic doc graph as pagerank/triangles; anchors = source doc's
first two tokens; integer weights 6//outdeg so partial-sum order cannot
move a ulp)."""

from collections import Counter

import numpy as np
import pandas as pd
import ray.data as rd

from searchengine_ray.stages.text import simple_tokens


def _docs(n=97):
    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(15)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 8)))
             for _ in range(n)]
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


def _brute(docs: pd.DataFrame, k: int) -> pd.DataFrame:
    n = len(docs)
    texts = dict(zip(docs["doc_id"], docs["text"]))
    w: Counter = Counter()
    for src in docs["doc_id"]:
        dsts = [(src * 31 + j) % n for j in (1, 2, 3)]
        dsts = [d for d in dsts if d != src]
        if not dsts:
            continue
        anchors = simple_tokens(texts[src] or "")[:2]
        for d in dsts:
            for t in anchors:
                w[(d, t)] += 6 // len(dsts)
    out = pd.DataFrame([(d, t, c) for (d, t), c in w.items()],
                       columns=["dst", "token", "w"])
    return (out.astype({"dst": np.int64, "w": np.int64})
            .sort_values(["w", "dst", "token"],
                         ascending=[False, True, True])
            .head(k).reset_index(drop=True))


def test_matches_bruteforce(ray_session):
    from searchengine_ray.pipelines.queries import anchor_text_weights

    docs = _docs()
    ds = rd.from_pandas(docs).repartition(5)
    got = anchor_text_weights(ds, len(docs), k=200).reset_index(drop=True)
    want = _brute(docs, k=200)
    pd.testing.assert_frame_equal(
        got.astype({"dst": np.int64, "w": np.int64}), want)


def test_weights_integer_and_bounded(ray_session):
    from searchengine_ray.pipelines.queries import anchor_text_weights

    docs = _docs(50)
    ds = rd.from_pandas(docs)
    got = anchor_text_weights(ds, len(docs), k=10_000)
    assert got["w"].dtype == np.int64
    # each inlink contributes at most 6 per anchor token; indegree ≤ 3·n
    assert (got["w"] >= 2).all()  # 6//3 = 2 is the smallest contribution
