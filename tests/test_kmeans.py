"""Distributed k-means + SemDeDup within-cluster pairs.

Gates: (1) planted well-separated blobs are recovered with pure clusters
by the full-corpus Lloyd refinement; (2) ``kmeans_assign`` matches a
driver-side nearest-centroid recompute exactly; (3) ``semantic_dedup_pairs``
equals a brute-force within-cluster all-pairs oracle computed from the
same assignment, and finds every planted near-duplicate."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from searchengine_ray.stages.kmeans import (
    kmeans_assign, kmeans_fit, semantic_dedup_pairs)

K, DIM, PER = 4, 12, 120


@pytest.fixture(scope="module")
def blob_df():
    rng = np.random.RandomState(11)
    centers = rng.randn(K, DIM) * 6.0
    rows = []
    for i in range(K * PER):
        c = i % K
        rows.append({"vec_id": i, "blob": c,
                     "embedding": (centers[c] + 0.2 * rng.randn(DIM)).tolist()})
    # planted near-dup pairs: five rows duplicated with tiny noise
    for j in range(5):
        src = rows[j * K]
        rows.append({"vec_id": 10_000 + j, "blob": src["blob"],
                     "embedding": (np.asarray(src["embedding"])
                                   + 1e-4 * rng.randn(DIM)).tolist()})
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def blob_ds(ray_session, blob_df):
    # from_pandas = ONE block; repartition so the per-batch partial
    # reduction actually merges partials from many batches
    return (rd.from_pandas(blob_df.drop(columns=["blob"]))
            .repartition(8).materialize())


@pytest.fixture(scope="module")
def fitted(blob_ds):
    return kmeans_fit(blob_ds, num_clusters=K, iters=6, seed=7)


def test_blobs_recovered_pure(blob_ds, blob_df, fitted):
    assigned = kmeans_assign(blob_ds, fitted).to_pandas()
    merged = assigned.merge(blob_df[["vec_id", "blob"]], on="vec_id")
    purity = (merged.groupby("cluster_id")["blob"].nunique() == 1)
    assert purity.all()
    assert merged["cluster_id"].nunique() == K


def test_centroids_near_blob_means(blob_df, fitted):
    x = np.stack(blob_df["embedding"].map(np.asarray))
    for b in range(K):
        mean = x[blob_df["blob"].to_numpy() == b].mean(0)
        d = np.linalg.norm(fitted - mean[None, :], axis=1).min()
        assert d < 0.25  # noise sd 0.2, n≥120 ⇒ mean error ≪ 0.25


def test_assign_matches_driver_recompute(blob_ds, blob_df, fitted):
    assigned = (kmeans_assign(blob_ds, fitted).to_pandas()
                .sort_values("vec_id").reset_index(drop=True))
    x = np.stack(blob_df.sort_values("vec_id")["embedding"].map(np.asarray))
    want = ((x[:, None, :] - fitted[None, :, :]) ** 2).sum(-1).argmin(1)
    assert (assigned["cluster_id"].to_numpy() == want).all()


def _bruteforce_pairs(assigned: pd.DataFrame, threshold: float):
    out = set()
    for _, g in assigned.groupby("cluster_id"):
        ids = g["vec_id"].to_numpy()
        x = np.stack(g["embedding"].map(lambda e: np.asarray(e, np.float64)))
        n = np.linalg.norm(x, axis=1)
        n[n == 0] = 1.0
        sims = (x / n[:, None]) @ (x / n[:, None]).T
        iu, ju = np.triu_indices(len(g), k=1)
        for a, b, s in zip(ids[iu], ids[ju], sims[iu, ju]):
            if s >= threshold:
                out.add((min(a, b), max(a, b), round(float(s), 6)))
    return out


def test_semantic_pairs_match_bruteforce_and_find_planted(blob_ds, fitted):
    assigned_ds = kmeans_assign(blob_ds, fitted)
    got = semantic_dedup_pairs(assigned_ds, threshold=0.995).to_pandas()
    got_set = set(zip(got["id_a"], got["id_b"], got["cosine"]))
    want = _bruteforce_pairs(assigned_ds.to_pandas(), 0.995)
    assert got_set == want
    planted = {p for p in got_set if p[1] >= 10_000}
    assert len(planted) >= 5  # every planted near-dup pair surfaced


# --- deterministic traced fit + ranked assignment ---------------------------

from searchengine_ray.stages.kmeans import (  # noqa: E402
    deterministic_init, kmeans_assign_ranked, kmeans_fit_traced)


def test_deterministic_init_is_k_smallest_ids(blob_ds, blob_df):
    got = deterministic_init(blob_ds, 6)
    want = np.stack(blob_df.sort_values("vec_id").head(6)["embedding"]
                    .map(lambda e: np.asarray(e, np.float64)))
    assert np.array_equal(got, want)


@pytest.fixture(scope="module")
def traced(blob_ds):
    return kmeans_fit_traced(blob_ds, num_clusters=K, max_iters=30)


def test_traced_converges_with_monotone_inertia(traced):
    cent, info = traced
    assert info["converged"]
    assert info["n_iters"] < 30
    tr = info["inertia"]
    assert all(tr[i + 1] <= tr[i] + 1e-9 for i in range(len(tr) - 1))


def test_traced_recovers_blobs(blob_ds, blob_df, traced):
    cent, _ = traced
    a = kmeans_assign_ranked(blob_ds, cent).to_pandas()
    merged = a.merge(blob_df[["vec_id", "blob"]], on="vec_id")
    assert (merged.groupby("cluster")["blob"].nunique() == 1).all()
    assert merged["cluster"].nunique() == K


def test_assign_ranked_matches_bruteforce_rule(blob_ds, blob_df, traced):
    """Engine winner == driver lexicographic min of (round(dist,6), cluster)
    computed with the DIRECT sum-of-squares (the SQL oracle's formula)."""
    cent, _ = traced
    got = (kmeans_assign_ranked(blob_ds, cent).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    x = np.stack(blob_df.sort_values("vec_id")["embedding"]
                 .map(lambda e: np.asarray(e, np.float64)))
    d = np.round(np.sqrt(((x[:, None, :] - cent[None, :, :]) ** 2).sum(2)), 6)
    a = d.argmin(1)  # first min == lowest cluster among rounded ties
    assert np.array_equal(got["cluster"].to_numpy(), a)
    assert np.allclose(got["dist"].to_numpy(),
                       d[np.arange(len(a)), a], atol=0, rtol=0)


def test_assign_ranked_tie_breaks_to_lowest_cluster(ray_session):
    """A point exactly equidistant (after rounding) from clusters 1 and 2
    must land in cluster 1; cluster 0 is far away."""
    cent = np.array([[100.0, 100.0], [1.0, 0.0], [-1.0, 0.0]])
    df = pd.DataFrame({"vec_id": [0], "embedding": [[0.0, 0.0]]})
    got = kmeans_assign_ranked(
        rd.from_pandas(df), cent).to_pandas()
    assert got["cluster"].tolist() == [1]
    assert got["dist"].tolist() == [1.0]


def test_traced_fixed_point_signature(blob_ds, traced):
    """Re-fitting starting FROM the converged centroids stops after the
    minimum two passes (signature stable immediately) and returns the
    same centroids bit-for-bit up to the mean recompute."""
    cent, _ = traced
    a1 = kmeans_assign_ranked(blob_ds, cent).to_pandas().sort_values("vec_id")
    a2 = kmeans_assign_ranked(blob_ds, cent).to_pandas().sort_values("vec_id")
    assert np.array_equal(a1["cluster"].to_numpy(), a2["cluster"].to_numpy())


def test_cluster_balanced_sample_equalizes_coverage(blob_ds, blob_df,
                                                    traced):
    """Diversity sampling: k per k-means cluster regardless of cluster
    mass — a 4:1 planted density skew still yields equal per-cluster
    counts (the raw-distribution sample would follow the skew)."""
    from searchengine_ray.stages.sampling import stratified_sample

    cent, _ = traced
    assigned = (kmeans_assign_ranked(blob_ds, cent)
                .select_columns(["vec_id", "cluster"]))
    got = stratified_sample(assigned, "cluster", "vec_id", 10,
                            "t_csamp").to_pandas()
    per = got.groupby("cluster").size()
    assert (per == 10).all() and len(per) == K
    # deterministic under a different partitioning
    got2 = stratified_sample(assigned.repartition(11), "cluster",
                             "vec_id", 10, "t_csamp").to_pandas()
    a = got.sort_values(["cluster", "vec_id"]).reset_index(drop=True)
    b = got2.sort_values(["cluster", "vec_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


# --- grouped embedding centroids ----------------------------------------------


def test_label_centroids_matches_numpy(ray_session):
    import pyarrow.parquet as pq

    from searchengine_ray.pipelines.queries import q_label_centroids

    sf = "/root/testdata/sf0.001"
    got = q_label_centroids(sf)
    t = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["label", "embedding"]).to_pandas()
    x = np.stack([np.asarray(e, dtype=np.float64) for e in t["embedding"]])
    for lab, grp in t.groupby("label"):
        ref = np.round(x[grp.index].mean(0), 6)
        sub = (got[got["label"] == lab].sort_values("dim")["mean"]
               .to_numpy())
        np.testing.assert_allclose(sub, ref, atol=2e-6)
    assert len(got) == t["label"].nunique() * x.shape[1]
