"""Unit tests for stages/relational.py distributed join helpers."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from searchengine_ray.stages.relational import hash_semi_anti_join


def _mk(left_rows, right_keys, key_dtype=None):
    left = pd.DataFrame(left_rows)
    if key_dtype is not None:
        left["k"] = left["k"].astype(key_dtype)
    right = pd.DataFrame({"k": right_keys})
    if key_dtype is not None:
        right["k"] = right["k"].astype(key_dtype)
    lds = rd.from_pandas(left).repartition(4)
    rds = rd.from_pandas(right).repartition(3)
    return left, lds, rds


@pytest.mark.parametrize("anti", [False, True])
def test_semi_anti_int_keys(ray_session, anti):
    left, lds, rds = _mk(
        {"k": [1, 2, 3, 4, 5, 2, 3], "v": list("abcdefg")},
        [2, 4, 4, 9],  # dup right keys must not duplicate left rows
    )
    out = hash_semi_anti_join(lds, rds, on="k", anti=anti).to_pandas()
    present = left["k"].isin({2, 4})
    expect = left[~present] if anti else left[present]
    got = out.sort_values(["k", "v"]).reset_index(drop=True)
    exp = expect.sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_semi_string_keys(ray_session):
    left, lds, rds = _mk(
        {"k": ["u1", "u2", "u3", "u1"], "v": [1, 2, 3, 4]},
        ["u1", "zz"],
    )
    out = hash_semi_anti_join(lds, rds, on="k").to_pandas()
    assert sorted(out["v"].tolist()) == [1, 4]


def test_anti_64bit_keys_exact(ray_session):
    # keys above 2^53 — must survive the co-shuffle without float rounding
    big = np.array([2**63 - 1, 2**63 - 2, 2**53 + 1, 7], dtype=np.uint64)
    left = pd.DataFrame({"k": big.astype(np.int64), "v": [0, 1, 2, 3]})
    right = pd.DataFrame({"k": big[:2].astype(np.int64)})
    out = hash_semi_anti_join(
        rd.from_pandas(left).repartition(2),
        rd.from_pandas(right), on="k", anti=True).to_pandas()
    assert sorted(out["v"].tolist()) == [2, 3]
    assert out["k"].dtype == np.int64


def test_semi_anti_property_vs_pandas(ray_session):
    """Randomized equivalence vs the pandas semi/anti reference on keys
    with heavy duplication and values spanning the int64 range."""
    rng = np.random.RandomState(11)
    for trial in range(3):
        nl = int(rng.randint(1, 400))
        nr = int(rng.randint(0, 200))
        keys = rng.randint(-2**63, 2**63 - 1, size=max(nl, 1) // 3 + 2,
                           dtype=np.int64)
        left = pd.DataFrame({
            "k": rng.choice(keys, size=nl),
            "v": rng.randint(0, 1 << 30, size=nl).astype(np.int64)})
        right = pd.DataFrame({"k": rng.choice(keys, size=nr)}) if nr else \
            pd.DataFrame({"k": pd.Series([], dtype="int64")})
        lds = rd.from_pandas(left).repartition(3)
        rds = rd.from_pandas(right).repartition(2) if nr else rd.from_pandas(right)
        rset = set(right["k"].tolist())
        for anti in (False, True):
            out = hash_semi_anti_join(lds, rds, on="k", anti=anti).to_pandas()
            mask = left["k"].isin(rset)
            exp = left[~mask] if anti else left[mask]
            got = out.sort_values(["k", "v"]).reset_index(drop=True)
            expc = exp.sort_values(["k", "v"]).reset_index(drop=True)
            pd.testing.assert_frame_equal(got, expc), (trial, anti)


def test_hash_bucket_key_consistency(ray_session):
    """Every row of a key must land in the same bucket (the co-shuffle
    contract all bucketed ops rely on)."""
    from searchengine_ray.stages.relational import _hash_bucket

    rng = np.random.RandomState(3)
    df = pd.DataFrame({
        "a": rng.choice([1, 2, 3, -5, 2**62], size=500),
        "b": rng.choice(["x", "y", "zz"], size=500)})
    for keys in (["a"], ["b"], ["a", "b"]):
        df2 = df.copy()
        df2["_bucket"] = _hash_bucket(df2, keys, 7)
        assert (df2["_bucket"] >= 0).all() and (df2["_bucket"] < 7).all()
        n_buckets_per_key = df2.groupby(keys)["_bucket"].nunique()
        assert (n_buckets_per_key == 1).all()


def test_anti_empty_right(ray_session):
    left, lds, rds = _mk({"k": [1, 2], "v": ["a", "b"]}, [])
    rds = rd.from_pandas(pd.DataFrame({"k": pd.Series([], dtype="int64")}))
    out = hash_semi_anti_join(lds, rds, on="k", anti=True).to_pandas()
    assert len(out) == 2


def test_semi_anti_null_keys_not_exists_semantics(ray_session):
    """Pinned NULL-key contract (NOT EXISTS semantics): a null key matches
    nothing — semi drops null-key left rows, anti KEEPS them; null right
    keys are ignored (they never empty the anti result the way SQL NOT IN
    would)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    left = pd.DataFrame({"k": pd.array([1, 2, None, 4], dtype="Int64"),
                         "v": ["a", "b", "c", "d"]})
    right = pd.DataFrame({"k": pd.array([2, None, None], dtype="Int64")})
    lds = rd.from_pandas(left).repartition(2)
    rds = rd.from_pandas(right).repartition(2)

    semi = hash_semi_anti_join(lds, rds, on="k").to_pandas()
    assert sorted(semi["v"]) == ["b"]

    anti = hash_semi_anti_join(lds, rds, on="k", anti=True).to_pandas()
    assert sorted(anti["v"]) == ["a", "c", "d"]


def test_broadcast_interval_join(ray_session):
    """Half-open [lo,hi) containment: inner drops out-of-band and NaN
    facts, left keeps them with null payload."""
    import ray.data as rd

    from searchengine_ray.stages.relational import broadcast_interval_join

    bands = pd.DataFrame({"lo": [0.0, 10.0], "hi": [10.0, 20.0],
                          "band": ["lo", "hi"]})
    facts = pd.DataFrame({
        "fact_id": np.arange(6, dtype=np.int64),
        "v": [0.0, 9.999, 10.0, 19.99, 25.0, np.nan]})

    inner = (broadcast_interval_join(rd.from_pandas(facts), bands, "v")
             .to_pandas().sort_values("fact_id").reset_index(drop=True))
    assert inner["fact_id"].tolist() == [0, 1, 2, 3]
    assert inner["band"].tolist() == ["lo", "lo", "hi", "hi"]

    left = (broadcast_interval_join(rd.from_pandas(facts), bands, "v",
                                    how="left")
            .to_pandas().sort_values("fact_id").reset_index(drop=True))
    assert len(left) == 6
    assert left["band"].isna().tolist() == [False] * 4 + [True, True]


def test_broadcast_interval_join_validation(ray_session):
    import ray.data as rd

    from searchengine_ray.stages.relational import broadcast_interval_join

    facts = rd.from_pandas(pd.DataFrame({"v": [1.0]}))
    with pytest.raises(ValueError, match="overlap"):
        broadcast_interval_join(
            facts, pd.DataFrame({"lo": [0.0, 5.0], "hi": [6.0, 10.0],
                                 "band": ["a", "b"]}), "v")
    with pytest.raises(ValueError, match="empty interval"):
        broadcast_interval_join(
            facts, pd.DataFrame({"lo": [5.0], "hi": [5.0],
                                 "band": ["a"]}), "v")
    with pytest.raises(ValueError, match="collide"):
        broadcast_interval_join(
            facts, pd.DataFrame({"lo": [0.0], "hi": [9.0],
                                 "v": ["clash"]}), "v")


# --- skew_join ----------------------------------------------------------------


def _skew_frames(seed=13, n=2000, hot_frac=0.4):
    rng = np.random.RandomState(seed)
    n_hot = int(n * hot_frac)
    keys = np.concatenate([np.zeros(n_hot, np.int64),          # mega key
                           rng.randint(1, 60, n - n_hot)])
    left = pd.DataFrame({"k": keys,
                         "event_id": np.arange(n, dtype=np.int64),
                         "v": rng.uniform(0, 10, n)})
    right = pd.DataFrame({"k": np.arange(60, dtype=np.int64),
                          "seg": (np.arange(60, dtype=np.int64) % 7)})
    return left, right


def _sorted(df):
    return (df.sort_values(list(df.columns)).reset_index(drop=True)
            [sorted(df.columns)])


def test_skew_join_equals_hash_join(ray_session):
    import ray.data as rd

    from searchengine_ray.stages.relational import hash_join, skew_join

    lf, rf = _skew_frames()
    left = rd.from_pandas(lf).repartition(6).materialize()
    right = rd.from_pandas(rf).repartition(2).materialize()
    want = _sorted(hash_join(left, right, "k").to_pandas())
    got = _sorted(skew_join(left, right, "k", hot_count=100).to_pandas())
    pd.testing.assert_frame_equal(got, want)
    # the hot path must have bound: key 0 exceeds hot_count by construction
    assert (lf["k"] == 0).sum() >= 100
    # and an unmatched hot key must not fabricate rows
    assert set(got["k"]) <= set(rf["k"])


def test_skew_join_no_hot_keys_fallback(ray_session):
    import ray.data as rd

    from searchengine_ray.stages.relational import hash_join, skew_join

    lf, rf = _skew_frames(n=300, hot_frac=0.0)
    left = rd.from_pandas(lf).repartition(3).materialize()
    right = rd.from_pandas(rf).materialize()
    got = _sorted(skew_join(left, right, "k", hot_count=10**9).to_pandas())
    want = _sorted(hash_join(left, right, "k").to_pandas())
    pd.testing.assert_frame_equal(got, want)


def test_skew_join_broadcast_cap_raises(ray_session):
    import ray.data as rd

    from searchengine_ray.stages.relational import skew_join

    lf, rf = _skew_frames()
    # right side carries many rows for the hot key -> over a tiny cap
    rf_big = pd.concat([rf] + [pd.DataFrame({
        "k": np.zeros(50, np.int64),
        "seg": np.arange(50, dtype=np.int64)})], ignore_index=True)
    with pytest.raises(ValueError, match="broadcast_cap"):
        skew_join(rd.from_pandas(lf).materialize(),
                  rd.from_pandas(rf_big).materialize(),
                  "k", hot_count=100, broadcast_cap=10)


def test_skew_join_hot_key_missing_from_right(ray_session):
    import ray.data as rd

    from searchengine_ray.stages.relational import skew_join

    lf, rf = _skew_frames()
    rf2 = rf[rf["k"] != 0]  # drop the mega key's dim row
    got = skew_join(rd.from_pandas(lf).materialize(),
                    rd.from_pandas(rf2).materialize(),
                    "k", hot_count=100).to_pandas()
    assert 0 not in set(got["k"])  # inner semantics hold on the hot path
    assert len(got) == int((lf["k"] != 0).sum())


# --- grouped regression (q_user_trend) -----------------------------------------


def test_user_trend_matches_polyfit(ray_session):
    """Engine slope/intercept per user ≡ np.polyfit on the same centered
    x — the distributed moment sums must agree with the direct fit."""
    from searchengine_ray.pipelines.queries import q_user_trend

    sf = "/root/testdata/sf0.001"
    got = q_user_trend(sf).to_pandas().set_index("user_id")

    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["user_id", "ts", "value"])
    t0 = ev["ts"].to_numpy("datetime64[us]").astype(np.int64).min()
    ev["x"] = (ev["ts"].to_numpy("datetime64[us]").astype(np.int64)
               - t0) / 86400e6
    assert len(got) == ev["user_id"].nunique()
    for uid, g in ev.groupby("user_id"):
        if len(g) < 2:
            continue
        sl, ic = np.polyfit(g["x"].to_numpy(), g["value"].to_numpy(), 1)
        assert abs(got.loc[uid, "slope"] - sl) < 1e-5, uid
        assert abs(got.loc[uid, "intercept"] - ic) < 1e-4, uid
        assert got.loc[uid, "n"] == len(g)


def test_user_trend_exact_line(ray_session):
    """Points exactly on y = 3x + 2 recover slope 3, intercept 2."""
    import ray.data as rd

    from searchengine_ray.stages.relational import pre_aggregate

    x = np.array([0.0, 1.0, 2.0, 5.0])
    df = pd.DataFrame({"user_id": np.zeros(4, np.int64),
                       "x": x, "y": 3.0 * x + 2.0,
                       "xy": x * (3.0 * x + 2.0), "xx": x * x})
    agg = pre_aggregate(rd.from_pandas(df).repartition(2), ["user_id"],
                        {"n": (None, "count"), "sx": ("x", "sum"),
                         "sy": ("y", "sum"), "sxy": ("xy", "sum"),
                         "sxx": ("xx", "sum")}).to_pandas()
    n, sx, sy = float(agg["n"][0]), agg["sx"][0], agg["sy"][0]
    sxy, sxx = agg["sxy"][0], agg["sxx"][0]
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert slope == 3.0
    assert (sy - slope * sx) / n == 2.0


# --- A/B experiment readout ---------------------------------------------------


def test_ab_experiment_matches_independent_welch(ray_session):
    """q_ab_experiment's moment-sum t must equal the textbook Welch t
    computed independently via np.mean/np.var(ddof=1) per arm."""
    import pyarrow.parquet as pq

    from searchengine_ray.pipelines.queries import q_ab_experiment

    sf = "/root/testdata/sf0.001"
    got = q_ab_experiment(sf).set_index("event_type")
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["user_id", "event_type", "value"]
                       ).to_pandas()
    ev["arm"] = ev["user_id"] % 2
    for t, grp in ev.groupby("event_type"):
        a = grp[grp["arm"] == 0]["value"].to_numpy()
        b = grp[grp["arm"] == 1]["value"].to_numpy()
        tstat = (b.mean() - a.mean()) / np.sqrt(
            a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b))
        assert got.loc[t, "n_a"] == len(a) and got.loc[t, "n_b"] == len(b)
        assert abs(got.loc[t, "t_stat"] - round(float(tstat), 6)) < 1e-5
        assert abs(got.loc[t, "mean_diff"]
                   - round(float(b.mean() - a.mean()), 6)) < 1e-6


def test_semi_anti_preserves_int64_block_dtype(ray_session):
    """The widened right side must ZERO-FILL fixed-width filler columns
    (never pa.nulls): int64-with-nulls blocks degrade to float64 through
    the union co-shuffle's pandas conversions, poisoning downstream block
    dtypes (observed as lab:double schema drift in the distributed LPA
    carry-forward).  Pin: every output BLOCK keeps int64."""
    import ray
    import ray.data as rd

    left = pd.DataFrame({"k": np.arange(500, dtype=np.int64),
                         "v": np.arange(500, dtype=np.int64) * 7})
    right = pd.DataFrame({"k": np.arange(0, 500, 2, dtype=np.int64)})
    out = hash_semi_anti_join(rd.from_pandas(left).repartition(4),
                              rd.from_pandas(right).repartition(3),
                              on="k", anti=True)
    for ref in out.to_pandas_refs():
        blk = ray.get(ref)
        if len(blk):
            assert blk["v"].dtype == np.int64, blk.dtypes
    got = out.to_pandas()
    assert sorted(got["k"]) == list(range(1, 500, 2))
