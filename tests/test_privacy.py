"""k-anonymity suppression gates: both size routes equal the brute-force
group-count filter, the k boundary is exact, and NUL-containing string
keys stay route-deterministic (the hash_pandas_object categorize gotcha)."""

import numpy as np
import pandas as pd
import ray.data as rd

from searchengine_ray.stages.privacy import k_anonymity_suppress


def _corpus():
    rng = np.random.RandomState(3)
    n = 2000
    return pd.DataFrame({
        "row_id": np.arange(n, dtype=np.int64),
        "zip": rng.choice(["94110", "94117", "10001", "60601"], n),
        "age_band": rng.choice(["20s", "30s", "40s", "50s", "60s"], n,
                               p=[0.4, 0.3, 0.2, 0.07, 0.03]),
    })


def _want(df, k):
    n = df.groupby(["zip", "age_band"])["row_id"].transform("size")
    return set(df[n >= k]["row_id"])


def test_both_routes_match_brute_force(ray_session):
    df = _corpus()
    ds = rd.from_pandas(df).repartition(6).materialize()
    for k in (1, 25, 100_000):
        want = _want(df, k)
        got_b = k_anonymity_suppress(ds, ["zip", "age_band"], k).to_pandas()
        # an all-suppressed result loses its schema through Ray — treat
        # the schemaless empty as the empty id set
        ids_b = set(got_b["row_id"]) if len(got_b) else set()
        assert ids_b == want, k
        got_s = k_anonymity_suppress(ds, ["zip", "age_band"], k,
                                     broadcast_limit=0).to_pandas()
        ids_s = set(got_s["row_id"]) if len(got_s) else set()
        assert ids_s == want, k
        if want:  # schema preserved (co-shuffle route drops its key col)
            assert sorted(got_s.columns) == sorted(df.columns)


def test_k_boundary_exact(ray_session):
    # group sizes 13, 14, 15 — k=14 keeps exactly the latter two
    rows = []
    rid = 0
    for g, sz in (("a", 13), ("b", 14), ("c", 15)):
        for _ in range(sz):
            rows.append({"row_id": rid, "zip": g, "age_band": "x"})
            rid += 1
    df = pd.DataFrame(rows)
    ds = rd.from_pandas(df).repartition(4)
    got = k_anonymity_suppress(ds, ["zip", "age_band"], 14).to_pandas()
    assert set(got["zip"]) == {"b", "c"} and len(got) == 29


def test_separator_injection_keys_stay_distinct(ray_session):
    # ("a\x1fb", "c") vs ("a", "b\x1fc"): a naive separator join makes
    # these the same composite key; the netstring encoding must keep
    # them distinct size-3 groups on BOTH routes.  (NUL bytes inside
    # values are out of contract — this stack's Arrow→pandas string
    # conversion merges NUL-differentiated values upstream of any
    # operator code; see _key_frame's docstring.)
    # group A (size 4) qualifies at k=4; group B (size 3) must be
    # suppressed — under a colliding composite key B would ride on A's
    # qualification and survive wrongly
    df = pd.DataFrame({
        "row_id": np.arange(7, dtype=np.int64),
        "zip": ["a\x1fb"] * 4 + ["a"] * 3,
        "age_band": ["c"] * 4 + ["b\x1fc"] * 3})
    ds = rd.from_pandas(df).repartition(3)
    for lim in (5_000_000, 0):
        got = k_anonymity_suppress(ds, ["zip", "age_band"], 4,
                                   broadcast_limit=lim).to_pandas()
        assert set(got["row_id"]) == {0, 1, 2, 3}, lim


# --- Laplace noisy counts -----------------------------------------------------


def test_laplace_noise_distribution_and_determinism(ray_session):
    import ray.data as rd

    from searchengine_ray.stages.privacy import laplace_noisy_counts

    rng = np.random.default_rng(2)
    df = pd.DataFrame({"g": rng.choice([f"k{i}" for i in range(200)], 5000)})
    a = laplace_noisy_counts(rd.from_pandas(df).repartition(4), "g", "s1")
    b = laplace_noisy_counts(rd.from_pandas(df).repartition(9), "g", "s1")
    pd.testing.assert_frame_equal(a, b)          # partitioning-invariant
    exact = df["g"].value_counts().sort_index()
    noise = a.set_index("g")["noisy_n"] - exact
    # Laplace(b=1): median |noise| = ln(2) ≈ 0.69, P(|x|>5) = e^-5
    assert np.abs(noise).median() < 2.0
    assert np.abs(noise).max() < 15.0
    assert (noise != 0).any()                    # noise actually applied
    # a different salt redraws the noise
    c = laplace_noisy_counts(rd.from_pandas(df), "g", "s2")
    assert not np.allclose(a["noisy_n"], c["noisy_n"])


def test_laplace_noise_is_signed(ray_session):
    import ray.data as rd

    from searchengine_ray.stages.privacy import laplace_noisy_counts

    df = pd.DataFrame({"g": [f"key{i}" for i in range(300)]})
    out = laplace_noisy_counts(rd.from_pandas(df), "g", "sx")
    noise = out["noisy_n"].to_numpy() - 1.0      # every count is 1
    assert (noise > 0).any() and (noise < 0).any()
    # symmetric-ish: both signs occur in quantity over 300 draws
    assert 0.3 < (noise > 0).mean() < 0.7
