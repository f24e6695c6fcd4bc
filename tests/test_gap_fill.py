"""Gap-fill date spine vs brute force: zero rows explicit, spans bound,
single-day users, composite-key overflow guard."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from searchengine_ray.stages.sessions import gap_fill_daily

DAY_US = 86_400_000_000


def _events():
    rng = np.random.default_rng(21)
    rows = []
    for u in range(30):
        days = np.sort(rng.choice(np.arange(100), size=rng.integers(1, 12),
                                  replace=False))
        for d in days:
            for _ in range(rng.integers(1, 4)):
                rows.append((u, d * DAY_US + int(rng.integers(0, DAY_US))))
    df = pd.DataFrame(rows, columns=["user_id", "ts_us"])
    df["ts"] = df["ts_us"].astype("datetime64[us]")
    return df[["user_id", "ts"]]


def _brute(df: pd.DataFrame) -> pd.DataFrame:
    d = df.copy()
    d["day"] = d["ts"].astype("datetime64[us]").astype(np.int64) // DAY_US
    counts = d.groupby(["user_id", "day"]).size()
    out = []
    for u, g in d.groupby("user_id"):
        for day in range(int(g["day"].min()), int(g["day"].max()) + 1):
            out.append((u, day, int(counts.get((u, day), 0))))
    return (pd.DataFrame(out, columns=["user_id", "day", "n_events"])
            .astype(np.int64))


def test_matches_bruteforce(ray_session):
    df = _events()
    got = (gap_fill_daily(rd.from_pandas(df).repartition(4))
           .to_pandas().sort_values(["user_id", "day"])
           .reset_index(drop=True).astype(np.int64))
    want = (_brute(df).sort_values(["user_id", "day"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    # gaps exist and are explicit zeros
    assert (got["n_events"] == 0).any()
    # every user's span is contiguous
    for _, g in got.groupby("user_id"):
        days = g["day"].to_numpy()
        assert (np.diff(days) == 1).all()


def test_single_event_user(ray_session):
    df = pd.DataFrame({"user_id": [7],
                       "ts": pd.to_datetime(["2024-03-01 12:00:00"])})
    got = gap_fill_daily(rd.from_pandas(df)).to_pandas()
    assert len(got) == 1 and int(got["n_events"].iloc[0]) == 1


def test_overflow_guard(ray_session):
    df = pd.DataFrame({"user_id": [2**40],
                       "ts": pd.to_datetime(["2024-03-01"])})
    with pytest.raises(Exception, match="overflow"):
        gap_fill_daily(rd.from_pandas(df)).to_pandas()
