"""Deterministic embedding-inference stage (stages/embed.py)."""

import numpy as np
import pandas as pd
import pytest

from searchengine_ray.stages.embed import (
    EMBED_DIM, N_BUCKETS, HashedEmbedder, projection_matrix)


def test_hand_computed_single_doc():
    emb = HashedEmbedder()
    df = pd.DataFrame({"doc_id": np.array([7], dtype=np.int64),
                       "text": ["fast fast go"]})
    out = emb(df)
    b_fast = sum(map(ord, "fast")) % N_BUCKETS
    b_go = sum(map(ord, "go")) % N_BUCKETS
    W = projection_matrix()
    expect = 2 * W[b_fast] + W[b_go]
    got = np.array([out.loc[0, f"emb_{d}"] for d in range(EMBED_DIM)])
    np.testing.assert_allclose(got, np.round(expect, 6), atol=1e-9)
    assert out.loc[0, "n_tokens"] == 3


def test_empty_docs_excluded_and_cache_stable(ray_session):
    import ray.data as rd

    from searchengine_ray.stages.embed import embed_documents

    df = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64),
                       "text": ["alpha beta", "", "alpha beta", "   "]})
    out = (embed_documents(rd.from_pandas(df).repartition(2))
           .to_pandas().set_index("doc_id").sort_index())
    assert list(out.index) == [0, 2]
    # identical docs → identical embeddings (per-worker cache included)
    assert (out.loc[0] == out.loc[2]).all()


def test_projection_matches_sql_formula():
    W = projection_matrix()
    assert W[173, 0] == pytest.approx(np.sin(173 * 31 + 7))
    assert W.shape == (N_BUCKETS, EMBED_DIM)
