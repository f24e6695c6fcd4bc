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
