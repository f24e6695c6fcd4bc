"""Table profiling (stages/profile.py)."""

import numpy as np
import pandas as pd


def test_table_profile_hand_case(ray_session):
    import ray.data as rd

    from searchengine_ray.stages.profile import table_profile

    df = pd.DataFrame({
        "a": [1.0, 2.5, 2.5, None, 7.0],
        "b": ["x", "y", "x", "z", None],
        "c": np.arange(5, dtype=np.int64),
    })
    out = (table_profile(rd.from_pandas(df).repartition(3), ["a", "b", "c"])
           .to_pandas().set_index("column"))
    assert out.loc["a", "n_rows"] == 5
    assert out.loc["a", "n_null"] == 1
    assert out.loc["a", "n_distinct"] == 3
    assert out.loc["a", "min_v"] == "1.0"
    assert out.loc["a", "max_v"] == "7.0"
    assert out.loc["b", "n_null"] == 1
    assert out.loc["b", "n_distinct"] == 3
    assert out.loc["b", "min_v"] == "x" and out.loc["b", "max_v"] == "z"
    assert out.loc["c", "n_distinct"] == 5
    assert out.loc["c", "min_v"] == "0" and out.loc["c", "max_v"] == "4"


def test_table_profile_all_null_column(ray_session):
    import ray.data as rd

    from searchengine_ray.stages.profile import table_profile

    df = pd.DataFrame({"a": [None, None], "b": [1.0, 2.0]})
    out = (table_profile(rd.from_pandas(df), ["a", "b"])
           .to_pandas().set_index("column"))
    assert out.loc["a", "n_null"] == 2
    assert out.loc["a", "n_distinct"] == 0
    assert out.loc["a", "min_v"] is None


# --- grouped histogram --------------------------------------------------------


def test_grouped_histogram_brute(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from searchengine_ray.stages.profile import grouped_histogram

    rng = np.random.RandomState(5)
    df = pd.DataFrame({"g": rng.choice(["a", "b", "c"], 500),
                       "v": rng.uniform(-3.0, 7.0, 500)})
    # plant exact extremes so the max-value clamp path is exercised
    df.loc[0, "v"], df.loc[1, "v"] = -3.0, 7.0
    got = (grouped_histogram(rd.from_pandas(df).repartition(4), "g", "v",
                             bins=10)
           .to_pandas().sort_values(["g", "bin"]).reset_index(drop=True))
    lo, hi = df["v"].min(), df["v"].max()
    b = np.minimum(np.floor((df["v"].to_numpy() - lo) * 10.0 / (hi - lo)),
                   9).astype(np.int64)
    want = (pd.DataFrame({"g": df["g"], "bin": b})
            .groupby(["g", "bin"]).size().reset_index(name="n"))
    got_map = {(r.g, r.bin): r.n for r in got.itertuples()}
    want_map = {(r.g, r.bin): r.n for r in want.itertuples()}
    assert got_map == want_map
    assert got["bin"].max() == 9 and got["bin"].min() == 0
    assert got["n"].sum() == 500


def test_grouped_histogram_degenerate(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from searchengine_ray.stages.profile import grouped_histogram

    df = pd.DataFrame({"g": ["x"] * 8, "v": np.full(8, 2.5)})
    out = grouped_histogram(rd.from_pandas(df), "g", "v", bins=4).to_pandas()
    assert len(out) == 1 and out["bin"].item() == 0 and out["n"].item() == 8


# --- quantile (rank) normalization --------------------------------------------


def test_quantile_normalize_matches_brute_force(ray_session):
    import ray.data as rd

    from searchengine_ray.stages.profile import value_rank_normalize

    rng = np.random.default_rng(41)
    n = 700
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        # lognormal + exact ties: both the skew and the tiebreak bind
        "v": np.round(rng.lognormal(1.0, 1.2, n), 1)})
    got = (value_rank_normalize(rd.from_pandas(df).repartition(5), "v", "id")
           .to_pandas().sort_values("id").reset_index(drop=True))
    ref = df.sort_values(["v", "id"], kind="mergesort").reset_index()
    ranks = np.empty(n, dtype=np.int64)
    ranks[ref["index"].to_numpy()] = np.arange(n)
    assert len(got) == n
    np.testing.assert_array_equal(got["pct"].to_numpy(),
                                  ranks / float(n - 1))
    assert got["pct"].min() == 0.0 and got["pct"].max() == 1.0


def test_quantile_normalize_degenerate_and_single(ray_session):
    import ray.data as rd

    from searchengine_ray.stages.profile import value_rank_normalize

    # all values equal: order falls back to id entirely, one hot bucket
    df = pd.DataFrame({"id": np.arange(9, dtype=np.int64),
                       "v": np.full(9, 3.5)})
    got = (value_rank_normalize(rd.from_pandas(df).repartition(3), "v", "id")
           .to_pandas().sort_values("id"))
    np.testing.assert_allclose(got["pct"].to_numpy(), np.arange(9) / 8.0)
    # single row: pct 0 by the percent_rank convention
    one = value_rank_normalize(
        rd.from_pandas(pd.DataFrame({"id": [5], "v": [2.0]})),
        "v", "id").to_pandas()
    assert one["pct"].tolist() == [0.0]


# --- winsorization + throttle dedup (query-level pins) ------------------------


def test_winsorize_clips_at_exact_quantiles(ray_session):
    import pyarrow.parquet as pq

    from searchengine_ray.pipelines.queries import q_winsorize

    sf = "/root/testdata/sf0.001"
    got = (q_winsorize(sf).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["event_id", "value"]).to_pandas()
    lo = np.quantile(ev["value"], 0.05)
    hi = np.quantile(ev["value"], 0.95)
    ref = np.clip(ev.sort_values("event_id")["value"].to_numpy(), lo, hi)
    np.testing.assert_allclose(got["v_clip"].to_numpy(), ref, atol=1e-9)
    assert (got["v_clip"] >= lo - 1e-12).all()
    assert (got["v_clip"] <= hi + 1e-12).all()
    # clipping actually binds at both tails
    assert (got["v_clip"].to_numpy() == lo).sum() >= len(ev) * 0.04
    assert (got["v_clip"].to_numpy() == hi).sum() >= len(ev) * 0.04


def test_throttle_dedup_matches_lag_brute_force(ray_session):
    import pyarrow.parquet as pq

    from searchengine_ray.pipelines.queries import q_throttle_dedup

    sf = "/root/testdata/sf0.001"
    got = set(q_throttle_dedup(sf).to_pandas()["event_id"])
    ev = (pq.read_table(f"{sf}/events.parquet",
                        columns=["event_id", "user_id", "ts"]).to_pandas()
          .sort_values(["user_id", "ts", "event_id"], kind="mergesort"))
    W = 2 * 3600 * 1_000_000
    keep = set()
    for _, g in ev.groupby("user_id"):
        t = g["ts"].astype("int64").to_numpy()
        ids = g["event_id"].to_numpy()
        for i in range(len(g)):
            if i == 0 or t[i] - t[i - 1] > W:
                keep.add(int(ids[i]))
    assert got == keep
    assert 0 < len(keep) < len(ev)   # the window binds non-vacuously
