"""Accuracy gates for the mergeable quantile sketch (stages/sketches.py)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from searchengine_ray.stages.sketches import (compress, quantile_sketch_aggregate,
                                              sketch_quantiles)


def _within_rank_band(x: np.ndarray, est: float, q: float, eps: float) -> bool:
    """Standard sketch guarantee: the estimate lies between the true values
    at ranks q-eps and q+eps (well-defined even on tie plateaus, where a
    pointwise rank error is not)."""
    lo = np.percentile(x, max(0.0, q - eps) * 100)
    hi = np.percentile(x, min(1.0, q + eps) * 100)
    return lo - 1e-9 <= est <= hi + 1e-9


def test_exact_when_uncompressed():
    rng = np.random.RandomState(0)
    v = np.sort(rng.randn(200))
    got = sketch_quantiles(v, np.ones_like(v), [0.0, 0.25, 0.5, 0.9, 1.0])
    want = np.percentile(v, [0, 25, 50, 90, 100])
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


@pytest.mark.parametrize("dist", ["normal", "lognormal", "bimodal", "ties"])
def test_rank_error_bound_single_sketch(dist):
    rng = np.random.RandomState(1)
    n, k = 200_000, 256
    if dist == "normal":
        x = rng.randn(n)
    elif dist == "lognormal":
        x = rng.lognormal(0, 2, size=n)
    elif dist == "bimodal":
        x = np.concatenate([rng.randn(n // 2), rng.randn(n // 2) + 50])
    else:
        x = rng.randint(0, 20, size=n).astype(np.float64)
    v = np.sort(x)
    cv, cw = compress(v, np.ones_like(v), k)
    assert cv.size <= k
    truth = np.sort(x)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        est = sketch_quantiles(cv, cw, [q])[0]
        assert _within_rank_band(truth, est, q, 2.0 / k), (dist, q)


def test_merge_matches_single_pass_bound():
    """Merging many partial sketches must keep the rank-error bound."""
    rng = np.random.RandomState(2)
    parts = [np.sort(rng.lognormal(0, 1.5, size=5_000)) for _ in range(40)]
    k = 256
    cvs, cws = [], []
    for p in parts:
        cv, cw = compress(p, np.ones_like(p), k)
        cvs.append(cv)
        cws.append(cw)
    v = np.concatenate(cvs)
    w = np.concatenate(cws)
    o = np.argsort(v, kind="mergesort")
    mv, mw = compress(v[o], w[o], k)
    truth = np.sort(np.concatenate(parts))
    for q in (0.05, 0.5, 0.95):
        est = sketch_quantiles(mv, mw, [q])[0]
        assert _within_rank_band(truth, est, q, 4.0 / k), q


def test_distributed_sketch_vs_exact(ray_session):
    rng = np.random.RandomState(3)
    n = 60_000
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], size=n,
                        p=[0.8, 0.15, 0.05]),  # skewed groups
        "x": rng.lognormal(0, 2, size=n)})
    ds = rd.from_pandas(df).repartition(8)
    out = quantile_sketch_aggregate(
        ds, ["g"], "x", {"p50": 0.5, "p90": 0.9, "p99": 0.99},
        k=256).to_pandas().set_index("g")
    for g, sub in df.groupby("g"):
        truth = np.sort(sub["x"].to_numpy())
        for col, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            est = out.loc[g, col]
            assert _within_rank_band(truth, est, q, 4.0 / 256), (g, col)


def test_distributed_many_groups(ray_session):
    rng = np.random.RandomState(8)
    n, ngroups = 40_000, 500
    df = pd.DataFrame({"g": rng.randint(0, ngroups, size=n),
                       "x": rng.lognormal(0, 1, size=n)})
    ds = rd.from_pandas(df).repartition(8)
    out = quantile_sketch_aggregate(
        ds, ["g"], "x", {"p50": 0.5}, k=128).to_pandas().set_index("g")
    assert len(out) == df["g"].nunique()
    for g in [0, 7, 123, 499]:
        x = df[df["g"] == g]["x"].to_numpy(np.float64)
        assert _within_rank_band(x, out.loc[g, "p50"], 0.5, 4.0 / 128)


def test_query_entry_vs_exact_on_events(ray_session):
    """The queries() entry stays inside the rank band vs exact percentiles
    on the real events table."""
    import pyarrow.parquet as pq

    from searchengine_ray.pipelines.queries import q_event_value_quantiles_sketch

    sf = "/root/testdata/sf0.001"
    out = q_event_value_quantiles_sketch(sf).to_pandas().set_index("event_type")
    raw = pq.read_table(f"{sf}/events.parquet",
                        columns=["event_type", "value"]).to_pandas()
    for g, sub in raw.groupby("event_type"):
        x = sub["value"].to_numpy(np.float64)
        assert _within_rank_band(x, out.loc[g, "median_value"], 0.5, 4.0 / 256)
        assert _within_rank_band(x, out.loc[g, "p90_value"], 0.9, 4.0 / 256)


def test_distributed_exact_small_groups(ray_session):
    """Groups smaller than k never compress — results equal np.percentile
    exactly even through the partial/merge machinery."""
    rng = np.random.RandomState(4)
    df = pd.DataFrame({"g": np.repeat(["u", "v"], 100),
                       "x": rng.randn(200)})
    ds = rd.from_pandas(df).repartition(4)
    out = quantile_sketch_aggregate(
        ds, ["g"], "x", {"med": 0.5}, k=1024).to_pandas().set_index("g")
    for g, sub in df.groupby("g"):
        np.testing.assert_allclose(out.loc[g, "med"],
                                   np.percentile(sub["x"], 50), atol=1e-12)


def test_mg_compress_undercount_bound():
    """Per-key undercount of one MG compression is ≤ total/(m+1)."""
    import pandas as pd

    rng = np.random.RandomState(3)
    keys = rng.zipf(1.5, size=20000) % 500
    counts = pd.Series(keys).value_counts()
    m = 20
    from searchengine_ray.stages.sketches import mg_compress

    keep = mg_compress(counts, m)
    assert len(keep) <= m
    total = counts.sum()
    for k, est in keep.items():
        assert counts[k] - est <= total / (m + 1) + 1e-9
    # dropped keys were all small enough that dropping respects the bound
    for k in counts.index.difference(keep.index):
        assert counts[k] <= total / (m + 1) + 1e-9


def test_heavy_hitters_exact_matches_bruteforce(ray_session):
    """Two-pass heavy hitters = exact value_counts + threshold, on skewed
    data split across many blocks (per-batch MG partials must not lose a
    true heavy hitter)."""
    import pandas as pd
    import ray.data as rd

    from searchengine_ray.stages.sketches import heavy_hitters_exact

    rng = np.random.RandomState(11)
    vals = (rng.zipf(1.3, size=30000) % 1000).astype(str)
    df = pd.DataFrame({"k": vals})
    ds = rd.from_pandas(df).repartition(16)

    thr = 0.01
    got = heavy_hitters_exact(ds, "k", threshold_frac=thr)
    counts = df["k"].value_counts()
    want = counts[counts > thr * len(df)]
    assert sorted(got["k"]) == sorted(want.index)
    assert dict(zip(got["k"], got["n"])) == {k: int(v) for k, v in want.items()}


# --- HyperLogLog distinct-count sketch --------------------------------------

def test_hll_rho_exact_bit_positions():
    from searchengine_ray.stages.sketches import _hll_rho
    p = 12
    # hand-built hashes: register bits then a window with a known top bit
    for lead_zeros in [0, 1, 5, 20, 40, 51]:
        w = np.uint64(1) << np.uint64(51 - lead_zeros)
        h = np.array([(w << np.uint64(p)) | np.uint64(7)], dtype=np.uint64)
        reg, rho = _hll_rho(h, p)
        assert reg[0] == 7
        assert rho[0] == lead_zeros + 1
    # all-zero window -> max rho
    h = np.array([3], dtype=np.uint64)  # only register bits set
    _, rho = _hll_rho(h, p)
    assert rho[0] == 53


@pytest.mark.parametrize("n_distinct", [50, 3_000, 200_000])
def test_hll_error_bound_vs_exact(ray_session, n_distinct):
    from searchengine_ray.stages.sketches import hll_distinct_aggregate
    rng = np.random.RandomState(4)
    keys = rng.randint(0, n_distinct, size=max(n_distinct * 2, 10_000))
    keys = np.concatenate([keys, np.arange(n_distinct)])  # every key present
    df = pd.DataFrame({"g": np.repeat("a", keys.size), "k": keys})
    ds = rd.from_pandas(df).repartition(8)
    got = hll_distinct_aggregate(ds, ["g"], "k", p=12).to_pandas()
    est = int(got["approx_distinct"].iloc[0])
    sigma = 1.04 / np.sqrt(4096)
    assert abs(est - n_distinct) <= max(5 * sigma * n_distinct, 3)


def test_hll_multi_group_and_merge(ray_session):
    """Many groups of very different cardinalities in one pass; the
    8-block repartition forces the register max-merge across batches."""
    from searchengine_ray.stages.sketches import hll_distinct_aggregate
    rng = np.random.RandomState(9)
    frames = []
    truth = {}
    for g, n in [("tiny", 3), ("small", 400), ("mid", 20_000)]:
        k = rng.randint(0, n, size=n * 3)
        k = np.concatenate([k, np.arange(n)])
        frames.append(pd.DataFrame({"g": np.repeat(g, k.size), "k": k}))
        truth[g] = n
    df = pd.concat(frames, ignore_index=True).sample(frac=1.0, random_state=1)
    ds = rd.from_pandas(df).repartition(8)
    got = hll_distinct_aggregate(ds, ["g"], "k", p=12).to_pandas()
    sigma = 1.04 / np.sqrt(4096)
    for _, r in got.iterrows():
        n = truth[r["g"]]
        assert abs(int(r["approx_distinct"]) - n) <= max(5 * sigma * n, 2), r
    assert len(got) == 3


def test_hll_query_entry_vs_exact_distinct(ray_session):
    """The distinct_users_hll queries() entry tracks the exact distinct
    count on the real sf0.01 events table (well inside the HLL band —
    at this scale every group sits in the near-exact linear-counting
    regime)."""
    import duckdb

    from searchengine_ray.pipelines.queries import QUERIES
    got = QUERIES["distinct_users_hll"]("/root/testdata/sf0.01")
    exact = duckdb.sql(
        "SELECT event_type, count(DISTINCT user_id) AS n FROM "
        "read_parquet('/root/testdata/sf0.01/events.parquet') "
        "GROUP BY event_type ORDER BY event_type").df()
    merged = got.merge(exact, on="event_type")
    assert len(merged) == len(exact)
    rel = (merged["n_users_approx"] - merged["n"]).abs() / merged["n"]
    assert (rel <= 0.05).all(), merged


def test_heavy_hitters_approx_one_pass_guarantees(ray_session):
    """One-pass MG bound: every true heavy hitter present; estimates
    undercount by at most N/(m+1); candidate set < 2/threshold."""
    from searchengine_ray.stages.sketches import heavy_hitters_approx
    rng = np.random.RandomState(13)
    thr = 0.02
    # 3 planted heavy keys well above threshold + a long uniform tail
    heavy = np.repeat([1_000_001, 1_000_002, 1_000_003],
                      [9_000, 6_000, 4_000])
    tail = rng.randint(0, 50_000, size=120_000)
    keys = np.concatenate([heavy, tail])
    rng.shuffle(keys)
    df = pd.DataFrame({"k": keys})
    ds = rd.from_pandas(df).repartition(8).materialize()

    got = heavy_hitters_approx(ds, "k", threshold_frac=thr)
    n = len(keys)
    truth = pd.Series(keys).value_counts()
    true_hh = set(truth[truth > thr * n].index)
    assert true_hh <= set(got["k"])           # completeness
    assert len(got) < 2 / thr                 # bounded candidate set
    m = int(np.ceil(2.0 / thr))
    for _, r in got.iterrows():
        t = int(truth.get(r["k"], 0))
        assert r["est"] <= t + 1e-9           # never overcounts
        assert t - r["est"] <= n / (m + 1) + 1e-9  # bounded undercount


# --- exact global quantile (iterative histogram refinement) -----------------


def _egq(vals, q, **kw):
    from searchengine_ray.stages.sketches import exact_global_quantile
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(4)
    return exact_global_quantile(ds, "v", q, **kw)


@pytest.mark.parametrize("q", [0.0, 0.25, 0.5, 0.75, 0.9, 1.0])
def test_exact_quantile_matches_numpy(ray_session, q):
    rng = np.random.RandomState(3)
    v = rng.lognormal(0, 2, size=5000)
    assert _egq(v, q) == pytest.approx(
        float(np.quantile(v, q, method="linear")), abs=0, rel=0)


def test_exact_quantile_forced_multipass(ray_session):
    """bins=4 + a tiny collect cap forces genuine interval recursion."""
    rng = np.random.RandomState(7)
    v = np.round(rng.randn(4000), 2)  # heavy ties
    for q in (0.1, 0.5, 0.77):
        got = _egq(v, q, bins=4, max_driver_rows=8)
        assert got == float(np.quantile(v, q, method="linear"))


def test_exact_quantile_tie_plateau_and_edges(ray_session):
    v = np.array([5.0] * 1000 + [1.0, 9.0])
    for q in (0.0, 0.5, 0.999, 1.0):
        assert _egq(v, q, bins=8, max_driver_rows=4) == float(
            np.quantile(v, q, method="linear"))
    assert _egq(np.array([42.0]), 0.7) == 42.0
    assert _egq(np.array([1.0, 2.0]), 0.5) == 1.5


def test_exact_quantile_nulls_and_adjacent_floats(ray_session):
    v = pd.Series([1.0, None, 2.0, np.nan, 3.0, None])
    assert _egq(v, 0.5) == 2.0
    base = 1.0
    tight = np.array([base, np.nextafter(base, 2), np.nextafter(base, 2)])
    assert _egq(tight, 0.5, bins=4, max_driver_rows=1) == float(
        np.quantile(tight, 0.5, method="linear"))
    assert np.isnan(_egq(pd.Series([None, None], dtype="float64"), 0.5))


# --- Count-Min sketch ---------------------------------------------------------


def test_count_min_never_underestimates_and_bound(ray_session):
    import ray.data as rd

    from searchengine_ray.stages.sketches import (count_min_build,
                                                  count_min_query)

    rng = np.random.default_rng(19)
    # zipf-ish skew: heavy hitters + a long adversarial tail
    vals = np.concatenate([
        np.repeat(np.arange(10), 400),          # 10 heavies × 400
        rng.integers(100, 40000, 12000)])       # tail
    df = pd.DataFrame({"v": vals.astype(np.int64)})
    sk = count_min_build(rd.from_pandas(df).repartition(6), "v",
                         depth=4, width=2048)
    n = len(df)
    exact = df["v"].value_counts()
    q = pd.Series(exact.index.to_numpy(np.int64))
    est = count_min_query(sk, q)
    true = exact.to_numpy()
    assert (est >= true).all()                     # one-sided, always
    assert sk.sum() == n * 4                       # every row counted d times
    # ε = e/w bound with the standard failure allowance: assert the
    # POINT guarantee for the heavies and the 99th percentile overall
    eps_n = np.e / 2048 * n
    heavy = est[:10] - true[:10]
    assert (heavy <= eps_n).all()
    assert np.quantile(est - true, 0.99) <= eps_n


def test_count_min_merge_is_exact(ray_session):
    import ray.data as rd

    from searchengine_ray.stages.sketches import count_min_build

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"v": rng.integers(0, 500, 3000).astype(np.int64)})
    whole = count_min_build(rd.from_pandas(df), "v", depth=3, width=512)
    a = count_min_build(rd.from_pandas(df.iloc[:1100]), "v",
                        depth=3, width=512)
    b = count_min_build(rd.from_pandas(df.iloc[1100:]), "v",
                        depth=3, width=512)
    np.testing.assert_array_equal(whole, a + b)   # integer, order-free
    # and repartitioning cannot move a single counter
    rep = count_min_build(rd.from_pandas(df).repartition(7), "v",
                          depth=3, width=512)
    np.testing.assert_array_equal(whole, rep)


def test_count_min_weighted_matches_exploded(ray_session):
    import ray.data as rd

    from searchengine_ray.stages.sketches import count_min_build

    df = pd.DataFrame({"v": np.array([1, 2, 3, 2], dtype=np.int64),
                       "w": np.array([3, 1, 5, 2], dtype=np.int64)})
    weighted = count_min_build(rd.from_pandas(df), "v", depth=3,
                               width=64, weight_col="w")
    exploded = pd.DataFrame({
        "v": np.repeat(df["v"].to_numpy(), df["w"].to_numpy())})
    plain = count_min_build(rd.from_pandas(exploded), "v", depth=3,
                            width=64)
    np.testing.assert_array_equal(weighted, plain)


def test_count_min_fractional_weights_one_sided(ray_session):
    """Fractional weight_col: partials stay float64 to the driver, so the
    one-sided est >= true guarantee holds exactly and the sketch cannot
    depend on batch boundaries (a per-batch int truncation broke both)."""
    import ray.data as rd

    from searchengine_ray.stages.sketches import (count_min_build,
                                                  count_min_query)

    rng = np.random.default_rng(23)
    keys = rng.integers(0, 300, 4000).astype(np.int64)
    w = rng.uniform(0.01, 0.99, 4000)           # strictly fractional
    df = pd.DataFrame({"v": keys, "w": w})
    sk = count_min_build(rd.from_pandas(df).repartition(5), "v",
                         depth=4, width=1024, weight_col="w",
                         batch_size=256)        # force many partials
    assert sk.dtype == np.float64               # fractional ⇒ float sketch
    exact = df.groupby("v")["w"].sum()
    q = pd.Series(exact.index.to_numpy(np.int64))
    est = count_min_query(sk, q)
    assert (est >= exact.to_numpy() - 1e-9).all()   # one-sided survives
    # batch boundaries cannot change the sketch beyond float-sum association
    sk2 = count_min_build(rd.from_pandas(df).repartition(11), "v",
                          depth=4, width=1024, weight_col="w",
                          batch_size=64)
    np.testing.assert_allclose(sk, sk2, rtol=0, atol=1e-9)
    # integer weights keep the pre-fix int64 bit-deterministic contract
    df_i = pd.DataFrame({"v": keys, "w": (w * 10).astype(np.int64) + 1})
    sk_i = count_min_build(rd.from_pandas(df_i).repartition(5), "v",
                           depth=4, width=1024, weight_col="w",
                           batch_size=256)
    assert sk_i.dtype == np.int64
    assert int(sk_i.sum()) == 4 * int(df_i["w"].sum())
