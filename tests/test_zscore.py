"""Grouped z-score outliers vs a pandas brute force on the sf0.001 table."""

import numpy as np
import pandas as pd


def test_zscore_outliers_matches_pandas(ray_session):
    from searchengine_ray.pipelines.queries import q_zscore_outliers

    sf = "/root/testdata/sf0.001"
    got = (q_zscore_outliers(sf).to_pandas()
           .sort_values(["l_orderkey", "l_linenumber", "l_returnflag", "q"])
           .reset_index(drop=True))

    li = pd.read_parquet(
        f"{sf}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_returnflag",
                 "l_quantity"])
    li["q"] = li["l_quantity"].to_numpy(np.float64).astype(np.int64)
    z_parts = []
    for f, g in li.groupby("l_returnflag"):
        q = g["q"].to_numpy(np.int64)
        n = len(q)
        mean = float(q.sum()) / n
        std = np.sqrt(float((q * q).sum()) / n - mean * mean)
        z = (q.astype(np.float64) - mean) / std
        keep = np.abs(z) > 1.6
        part = g.loc[keep, ["l_orderkey", "l_linenumber",
                            "l_returnflag", "q"]].copy()
        part["z"] = np.round(z[keep], 6)
        z_parts.append(part)
    want = (pd.concat(z_parts)
            .sort_values(["l_orderkey", "l_linenumber", "l_returnflag", "q"])
            .reset_index(drop=True))
    want["l_linenumber"] = want["l_linenumber"].astype(np.int64)
    got["l_linenumber"] = got["l_linenumber"].astype(np.int64)
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0
    # both tails present
    assert (got["z"] > 0).any() and (got["z"] < 0).any()


def test_mad_outliers_matches_brute_force_and_robustness(ray_session):
    import pyarrow.parquet as pq

    from searchengine_ray.pipelines.queries import q_mad_outliers

    sf = "/root/testdata/sf0.001"
    got = (q_mad_outliers(sf).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["event_id", "event_type", "value"]
                       ).to_pandas()
    rows = []
    for t, g in ev.groupby("event_type"):
        med = g["value"].median()
        mad = (g["value"] - med).abs().median()
        z = np.round((g["value"] - med).abs() / (1.4826 * mad), 6)
        for eid, zz in zip(g["event_id"], z):
            if zz > 1.8:
                rows.append((int(eid), t, float(zz)))
    rows.sort()
    assert list(map(tuple, got[["event_id", "event_type", "mad_z"]]
                    .to_numpy())) == rows
    assert len(rows) > 0                      # the threshold binds
    # robustness property: one enormous planted outlier barely moves the
    # MAD z of other points (it would explode a moment-based z's sigma)
    base = np.concatenate([np.random.default_rng(1).normal(0, 1, 500),
                           [1e6]])
    med = np.median(base)
    mad = np.median(np.abs(base - med))
    z_others = np.abs(base[:-1] - med) / (1.4826 * mad)
    assert np.quantile(z_others, 0.99) < 4.0  # scale stays ~N(0,1)
    sigma = base.std()
    assert (np.abs(base[:-1] - base.mean()) / sigma).max() < 0.1  # z broken


def test_mad_outliers_mad_zero_group_dropped(ray_session, tmp_path):
    """A group where >50% of the values are identical has MAD = 0 — the
    unguarded score is inf/nan and DuckDB's division-by-zero semantics are
    setting-dependent, so BOTH sides drop the whole group (engine kernel
    mad>0 mask ≡ SQL `WHERE mad.d > 0`)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from searchengine_ray.pipelines.queries import q_mad_outliers

    n = 40
    ev = pa.table({
        "event_id": pa.array(range(2 * n), pa.int64()),
        "event_type": pa.array(["flat"] * n + ["spread"] * n),
        # "flat": 30 identical values + 10 wild ones ⇒ MAD = 0 exactly
        "value": pa.array([5.0] * 30 + [1e5 * i for i in range(1, 11)]
                          + [float(i * i) for i in range(n)], pa.float64()),
    })
    pq.write_table(ev, tmp_path / "events.parquet")
    got = q_mad_outliers(str(tmp_path)).to_pandas()
    assert not (got["event_type"] == "flat").any()     # whole group dropped
    assert (got["event_type"] == "spread").any()       # normal group flags
    assert np.isfinite(got["mad_z"]).all()
