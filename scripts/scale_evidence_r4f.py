"""Scale evidence for the round-4 close operators: CDC upsert merge,
rolling 7-day distinct active users, and next-item transition counts.

Deterministic synthetic tables built in-Dataset (no disk fixture), one
quiet run; prints ONE JSON line.  Run from /root/repo:

    python scripts/scale_evidence_r4f.py
    GRAFT_UPSERT_N=8000000 GRAFT_ONLY=upsert python scripts/scale_evidence_r4f.py

What the numbers evidence:
- upsert: base N rows + a 1% delta.  The broadcast route must keep the
  base shuffle-free (time ~ two map passes over the base) and its driver
  work O(delta); the forced co-shuffle route on the SAME input is the
  large-delta fallback — the gap between them is the measured value of
  the size routing.  Output counts are checked against exact arithmetic.
- wau: rolling 7-day distinct users over N events / U users / 90 days.
  The explode factor is the window length over DISTINCT (day,user) pairs
  (≤ 90·U rows), so events/s should hold as N grows — raw events reach
  no all-to-all.
- transitions: N events in one user co-shuffle + one sort kernel per
  bucket; total transition mass must equal N − U exactly (each user with
  c events contributes c − 1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

ONLY = set(os.environ.get("GRAFT_ONLY",
                          "upsert,wau,transitions,skew").split(","))
UPSERT_N = int(os.environ.get("GRAFT_UPSERT_N", "2000000"))
EVENTS_N = int(os.environ.get("GRAFT_EVENTS_N", "2000000"))
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

out: dict = {"metric": "scale_evidence_r4f", "num_cpus": NUM_CPUS}


def _upsert() -> None:
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from searchengine_ray.stages.relational import upsert_merge

    n = UPSERT_N

    def mk_base(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["id"].to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id": ids,
            "version": np.zeros(len(ids), np.int64),
            "deleted": np.zeros(len(ids), bool),
            "text": pd.Series(ids).map("base {}".format).to_numpy()})

    base = (rd.range(n).map_batches(mk_base, batch_format="pandas",
                                    batch_size=65536).materialize())

    # 1% delta: every 200th id updated (v1), every 400th tombstoned (v2 —
    # half the updates die), every 500th new id inserted
    def mk_delta(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["id"].to_numpy(np.int64)
        u = ids[ids % 200 == 0]
        t = ids[ids % 400 == 0]
        a = ids[ids % 500 == 0] + 2 * n
        return pd.DataFrame({
            "doc_id": np.concatenate([u, t, a]),
            "version": np.concatenate([np.full(len(u), 1, np.int64),
                                       np.full(len(t), 2, np.int64),
                                       np.full(len(a), 1, np.int64)]),
            "deleted": np.concatenate([np.zeros(len(u), bool),
                                       np.ones(len(t), bool),
                                       np.zeros(len(a), bool)]),
            "text": np.concatenate([
                pd.Series(u).map("rev {}".format).to_numpy(),
                np.full(len(t), "", dtype=object),
                pd.Series(a).map("new {}".format).to_numpy()])})

    delta = (rd.range(n).map_batches(mk_delta, batch_format="pandas",
                                     batch_size=65536).materialize())
    n_tomb = (n - 1) // 400 + 1
    n_new = (n - 1) // 500 + 1
    want = n - n_tomb + n_new

    t0 = time.perf_counter()
    got_b = upsert_merge(base, delta, id_col="doc_id").count()
    t1 = time.perf_counter()
    got_c = upsert_merge(base, delta, id_col="doc_id",
                         broadcast_limit=0).count()
    t2 = time.perf_counter()
    assert got_b == want == got_c, (got_b, got_c, want)
    out["upsert"] = {
        "base_rows": n, "delta_rows": int(delta.count()),
        "broadcast_route_s": round(t1 - t0, 2),
        "coshuffle_route_s": round(t2 - t1, 2),
        "broadcast_rows_per_sec": round(n / (t1 - t0), 1),
        "merged_rows": int(got_b),
    }


def _mk_events(n: int, n_users: int, days: int = 90):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    day_us = 86_400_000_000
    base = np.datetime64("2024-01-01", "us").astype(np.int64)

    def build(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["id"].to_numpy(np.int64)
        rng = np.random.default_rng(ids[0] if len(ids) else 0)
        return pd.DataFrame({
            "event_id": ids,
            "user_id": rng.integers(0, n_users, len(ids)).astype(np.int64),
            "ts_us": base + rng.integers(0, days * day_us, len(ids))
            .astype(np.int64),
            "item": rng.integers(0, 200, len(ids)).astype(np.int64)})

    return (rd.range(n).map_batches(build, batch_format="pandas",
                                    batch_size=65536).materialize())


def _wau() -> None:
    import pandas as pd

    from searchengine_ray.stages.sessions import rolling_active_users

    n, n_users = EVENTS_N, max(1000, EVENTS_N // 1000)
    ev = _mk_events(n, n_users)

    def to_ts(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": df["user_id"],
                             "ts": df["ts_us"].astype("datetime64[us]")})

    ev_ts = ev.map_batches(to_ts, batch_format="pandas").materialize()
    t0 = time.perf_counter()
    wau = rolling_active_users(ev_ts, window_days=7).to_pandas()
    t1 = time.perf_counter()
    assert len(wau) == 90 and wau["wau"].max() <= n_users
    out["wau"] = {
        "events": n, "users": n_users, "report_days": int(len(wau)),
        "wall_s": round(t1 - t0, 2),
        "events_per_sec": round(n / (t1 - t0), 1),
    }


def _transitions() -> None:
    from searchengine_ray.stages.sessions import item_transitions

    n, n_users = EVENTS_N, max(1000, EVENTS_N // 1000)
    ev = _mk_events(n, n_users)
    t0 = time.perf_counter()
    tr = item_transitions(ev).to_pandas()
    t1 = time.perf_counter()
    # every user appears at these sizes (n >= 1000 * users): mass = n - U
    assert int(tr["n"].sum()) == n - n_users, (int(tr["n"].sum()), n - n_users)
    out["transitions"] = {
        "events": n, "users": n_users, "edges": int(len(tr)),
        "wall_s": round(t1 - t0, 2),
        "events_per_sec": round(n / (t1 - t0), 1),
    }


def _skew() -> None:
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from searchengine_ray.stages.relational import hash_join, skew_join

    n = EVENTS_N
    n_keys = 50_000

    def mk_left(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["id"].to_numpy(np.int64)
        rng = np.random.default_rng(ids[0] if len(ids) else 0)
        k = rng.integers(1, n_keys, len(ids)).astype(np.int64)
        k[ids % 4 == 0] = 0  # one mega key holds 25% of all rows
        return pd.DataFrame({"k": k, "event_id": ids,
                             "v": rng.uniform(0, 1, len(ids))})

    left = (rd.range(n).map_batches(mk_left, batch_format="pandas",
                                    batch_size=65536).materialize())
    right = rd.from_pandas(pd.DataFrame({
        "k": np.arange(n_keys, dtype=np.int64),
        "seg": np.arange(n_keys, dtype=np.int64) % 7})).materialize()

    t0 = time.perf_counter()
    c_plain = hash_join(left, right, "k").count()
    t1 = time.perf_counter()
    c_skew = skew_join(left, right, "k", hot_count=n // 20).count()
    t2 = time.perf_counter()
    assert c_plain == c_skew == n, (c_plain, c_skew, n)

    # The structural metric: the largest row count any ONE reduce task
    # must co-locate.  Wall time on a single node understates the skew
    # cost (a 4M-row vectorized pandas merge is cheap; on a cluster the
    # hot bucket is a per-worker heap bound and, at 10^9-row hot keys, an
    # OOM).  Exact per-bucket totals from the O(keys) count table.
    from searchengine_ray.stages.relational import (_hash_bucket,
                                                    default_num_buckets,
                                                    pre_aggregate)
    kc = pre_aggregate(left.select_columns(["k"]), ["k"],
                       {"n": (None, "count")}).to_pandas()
    kc["_b"] = _hash_bucket(kc, ["k"], default_num_buckets())
    per_bucket = kc.groupby("_b")["n"].sum()
    hot_thresh = n // 20
    cold_per_bucket = (kc[kc["n"] < hot_thresh].groupby("_b")["n"].sum())
    out["skew"] = {
        "left_rows": n, "hot_share": 0.25, "dim_rows": n_keys,
        "hash_join_s": round(t1 - t0, 2),
        "skew_join_s": round(t2 - t1, 2),
        "speedup": round((t1 - t0) / (t2 - t1), 2),
        "max_bucket_rows_plain": int(per_bucket.max()),
        "max_bucket_rows_skew_cold": int(cold_per_bucket.max()),
        "colocate_reduction": round(
            float(per_bucket.max()) / float(cold_per_bucket.max()), 1),
    }


def _bloom() -> None:
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from searchengine_ray.stages.relational import hash_join
    from searchengine_ray.state.bloom import bloom_prefilter, build_bloom

    n = EVENTS_N
    n_right = 5_000  # ~1% of the 500k key space → selective join

    def mk_left(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["id"].to_numpy(np.int64)
        rng = np.random.default_rng(ids[0] if len(ids) else 0)
        return pd.DataFrame({
            "k": rng.integers(0, 500_000, len(ids)).astype(np.int64),
            "v": rng.uniform(0, 1, len(ids))})

    left = (rd.range(n).map_batches(mk_left, batch_format="pandas",
                                    batch_size=65536).materialize())
    right = rd.from_pandas(pd.DataFrame({
        "k": np.arange(0, 500_000, 100, dtype=np.int64),
        "seg": np.arange(n_right, dtype=np.int64)})).materialize()

    t0 = time.perf_counter()
    c_plain = hash_join(left, right, "k").count()
    t1 = time.perf_counter()
    bloom = build_bloom(right, "k", m_bits=1 << 20, k=5)
    pruned = bloom_prefilter(left, bloom, "k").materialize()
    shuffled_rows = pruned.count()
    c_bloom = hash_join(pruned, right, "k").count()
    t2 = time.perf_counter()
    assert c_plain == c_bloom, (c_plain, c_bloom)
    out["bloom"] = {
        "left_rows": n, "right_keys": n_right,
        "rows_into_exchange_plain": n,
        "rows_into_exchange_bloom": int(shuffled_rows),
        "shuffle_reduction": round(n / shuffled_rows, 1),
        "hash_join_s": round(t1 - t0, 2),
        "bloom_join_s": round(t2 - t1, 2),
        "joined_rows": int(c_plain),
    }


if __name__ == "__main__":
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    if "upsert" in ONLY:
        _upsert()
    if "wau" in ONLY:
        _wau()
    if "transitions" in ONLY:
        _transitions()
    if "skew" in ONLY:
        _skew()
    if "bloom" in ONLY:
        _bloom()
    ray.shutdown()
    print(json.dumps(out))
