"""Similarity search: IVF probe path must agree with the brute-force
baseline on the bulk of results (and exactly when probing all centroids)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from searchengine_ray.stages.knn import build_centroids, knn_bruteforce, knn_ivf


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    rng = np.random.RandomState(3)
    base = rng.randn(8, 16)
    rows = []
    for i in range(400):
        c = i % 8
        rows.append({"vec_id": i, "embedding": (base[c] + 0.1 * rng.randn(16)).tolist()})
    return rd.from_pandas(pd.DataFrame(rows)).materialize()


def test_bruteforce_topk(emb_ds):
    q = np.array(emb_ds.take(1)[0]["embedding"])
    r = knn_bruteforce(emb_ds, q, k=10, exclude_ids={0})
    assert len(r) == 10
    assert (r["cosine"].to_numpy()[:-1] >= r["cosine"].to_numpy()[1:]).all()
    assert 0 not in set(r["vec_id"])


def test_ivf_all_probes_equals_bruteforce(emb_ds):
    q = np.array(emb_ds.take(1)[0]["embedding"])
    exact = knn_bruteforce(emb_ds, q, k=10, exclude_ids={0})
    ivf = knn_ivf(emb_ds, q, k=10, num_centroids=8, nprobe=8, exclude_ids={0})
    assert ivf["vec_id"].tolist() == exact["vec_id"].tolist()


def test_ivf_partial_probe_recall(emb_ds):
    q = np.array(emb_ds.take(1)[0]["embedding"])
    exact = set(knn_bruteforce(emb_ds, q, k=10, exclude_ids={0})["vec_id"])
    ivf = set(knn_ivf(emb_ds, q, k=10, num_centroids=8, nprobe=2,
                      exclude_ids={0})["vec_id"])
    # clustered data: the query's own cluster is probed → high recall
    assert len(exact & ivf) >= 8


def test_centroids_deterministic(emb_ds):
    c1 = build_centroids(emb_ds, num_centroids=8, seed=5)
    c2 = build_centroids(emb_ds, num_centroids=8, seed=5)
    np.testing.assert_allclose(c1, c2)
