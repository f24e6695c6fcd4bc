"""BM25 ranked retrieval (pipelines/search.bm25_search)."""

import math

import numpy as np
import pandas as pd
import pytest


def _bm25_ref(docs: dict[int, str], terms: list[str], k1=1.2, b=0.75):
    """Driver-side reference: Lucene-form BM25 with per-term round(·, 6)
    before the doc sum (the engine/SQL contract)."""
    import re
    tok = {d: re.findall(r"[a-z0-9]+", t.lower()) for d, t in docs.items()}
    n_total = len(docs)
    lens = {d: len(ts) for d, ts in tok.items() if ts}
    avgdl = sum(lens.values()) / len(lens)
    scores: dict[int, float] = {}
    for t in terms:
        df = sum(1 for ts in tok.values() if t in ts)
        if not df:
            continue
        idf = math.log(1.0 + (n_total - df + 0.5) / (df + 0.5))
        for d, ts in tok.items():
            cnt = ts.count(t)
            if not cnt:
                continue
            sc = idf * (cnt * (k1 + 1)) / (
                cnt + k1 * (1 - b + b * len(ts) / avgdl))
            scores[d] = round(scores.get(d, 0.0) + round(sc, 6), 12)
    return {d: round(s, 6) for d, s in scores.items()}


def test_bm25_hand_case(ray_session):
    import ray.data as rd

    from searchengine_ray.pipelines.search import bm25_search

    docs = {
        0: "fast merge fast sort",
        1: "merge join merge merge",
        2: "slow scan table",
        3: "fast",
        4: "",
    }
    df = pd.DataFrame({"doc_id": np.array(list(docs), dtype=np.int64),
                       "text": list(docs.values())})
    out = bm25_search(rd.from_pandas(df).repartition(3),
                      ["fast", "merge"], k=10)
    ref = _bm25_ref(docs, ["fast", "merge"])
    got = dict(zip(out["doc_id"], out["score"]))
    assert got == pytest.approx(ref)
    # ranked desc with doc_id tiebreak, only matching docs returned
    assert list(out["score"]) == sorted(out["score"], reverse=True)
    assert set(out["doc_id"]) == set(ref)


def test_bm25_no_hits_and_empty_terms(ray_session):
    import ray.data as rd

    from searchengine_ray.pipelines.search import bm25_search

    df = pd.DataFrame({"doc_id": np.array([0, 1], dtype=np.int64),
                       "text": ["alpha beta", "gamma delta"]})
    ds = rd.from_pandas(df)
    assert bm25_search(ds, ["nomatch"], k=5).empty
    assert bm25_search(ds, [], k=5).empty


def test_bm25_length_normalization_prefers_shorter(ray_session):
    """Same tf in a shorter doc scores higher (b > 0)."""
    import ray.data as rd

    from searchengine_ray.pipelines.search import bm25_search

    df = pd.DataFrame({
        "doc_id": np.array([0, 1], dtype=np.int64),
        "text": ["fast query", "fast " + "filler " * 30],
    })
    out = bm25_search(rd.from_pandas(df), ["fast"], k=2)
    assert list(out["doc_id"]) == [0, 1]
    assert out["score"].iloc[0] > out["score"].iloc[1]
