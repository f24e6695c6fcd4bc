"""Watermark / allowed-lateness accounting: the distributed prefix-max
(`late_data_stats`) must match a sequential brute-force watermark walk,
including the strict `<` boundary, the never-late first event, and
duplicate arrival keys resolved by the tiebreak column."""

import numpy as np
import pandas as pd
import pytest

DAY = 86_400_000_000
LATE = 43_200_000_000  # 12h


def _brute(df, lateness, order_cols):
    df = df.sort_values(order_cols, kind="mergesort")
    wm = None
    rows = []
    for _, r in df.iterrows():
        ts = int(r["ts_us"])
        late = wm is not None and ts < wm - lateness
        rows.append((ts // DAY, int(late)))
        wm = ts if wm is None else max(wm, ts)
    out = pd.DataFrame(rows, columns=["day", "late"])
    return (out.groupby("day", as_index=False)
            .agg(n_events=("late", "size"), n_late=("late", "sum"))
            .astype(np.int64))


def _run(df, num_buckets, ray_session, order_col="event_id",
         tiebreak_col=None):
    import ray.data as rd

    from searchengine_ray.stages.sessions import late_data_stats

    pdf = df.copy()
    pdf["ts"] = pdf["ts_us"].astype("datetime64[us]")
    cols = list({order_col, "event_id"} - {"ts"}) + ["ts"]
    ds = rd.from_pandas(pdf[cols]).repartition(4)
    got = late_data_stats(ds, lateness_us=LATE, order_col=order_col,
                          tiebreak_col=tiebreak_col,
                          num_buckets=num_buckets).to_pandas()
    return (got.sort_values("day").reset_index(drop=True)
            [["day", "n_events", "n_late"]].astype(np.int64))


def _mkdf(n, seed=11):
    rng = np.random.RandomState(seed)
    # arrival order scrambled vs event time: ts drifts forward with heavy
    # backward jitter so plenty of events fall behind the watermark
    base = np.cumsum(rng.randint(0, 3 * 10**9, size=n)).astype(np.int64)
    jitter = rng.randint(-2 * LATE, LATE, size=n).astype(np.int64)
    return pd.DataFrame({
        "event_id": np.arange(100, 100 + n, dtype=np.int64),
        "ts_us": np.maximum(base + jitter, 0),
    })


@pytest.mark.parametrize("num_buckets", [1, 7, 256])
def test_late_data_matches_brute(ray_session, num_buckets):
    df = _mkdf(600)
    got = _run(df, num_buckets, ray_session)
    want = _brute(df, LATE, ["event_id"])
    pd.testing.assert_frame_equal(got, want)


def test_late_data_duplicate_arrival_keys_tiebreak(ray_session):
    # arrival key with heavy duplication (many events share an arrival
    # tick) — order within a tick is the tiebreak column, and swapping the
    # tiebreak changes which duplicate is "first", so the test binds
    df = _mkdf(500, seed=3)
    rng = np.random.RandomState(4)
    df["ak"] = rng.randint(0, 40, size=len(df)).astype(np.int64)
    got = _run(df, 16, ray_session, order_col="ak", tiebreak_col="event_id")
    want = _brute(df, LATE, ["ak", "event_id"])
    pd.testing.assert_frame_equal(got, want)
    # reversing the tiebreak must give a DIFFERENT late count somewhere
    df2 = df.copy()
    df2["event_id"] = -df2["event_id"]
    want_rev = _brute(df2, LATE, ["ak", "event_id"])
    assert not want_rev["n_late"].equals(want["n_late"])


def test_late_data_boundary_and_first_event(ray_session):
    # event exactly AT wm - lateness is NOT late (strict <); one µs below is
    wm = 10 * DAY
    df = pd.DataFrame({
        "event_id": np.arange(4, dtype=np.int64),
        "ts_us": np.array([wm, wm - LATE, wm - LATE - 1, 0], dtype=np.int64),
    })
    got = _run(df, 256, ray_session)
    want = _brute(df, LATE, ["event_id"])
    pd.testing.assert_frame_equal(got, want)
    # first event sets the watermark and is itself never late
    assert int(got.loc[got["day"] == wm // DAY, "n_late"].iloc[0]) == 0
    # the two sub-watermark events: only the strictly-below one is late
    assert int(got["n_late"].sum()) == 2  # wm-LATE-1 and the ts=0 event
