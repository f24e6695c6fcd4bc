"""pivot_wide vs a pandas brute-force pivot (stages/relational.py)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from searchengine_ray.stages.relational import pivot_wide

CATS = ["a", "b", "c"]


def _rand_df(n=500, seed=0, cats=CATS):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "k": rng.integers(0, 40, n).astype(np.int64),
        "cat": rng.choice(cats, n),
        "v": np.round(rng.normal(10, 3, n), 2)})


def _brute(df, cats=CATS):
    out = pd.DataFrame({"k": np.sort(df["k"].unique())})
    for c in cats:
        sub = df[df["cat"] == c].groupby("k")["v"].agg(["sum", "size"])
        out[f"{c}_sum"] = out["k"].map(sub["sum"]).fillna(0.0).to_numpy()
        out[f"{c}_cnt"] = (out["k"].map(sub["size"]).fillna(0)
                           .to_numpy(np.int64))
    return out


def _run(df, **kw):
    got = (pivot_wide(rd.from_pandas(df).repartition(4), "k", "cat", "v",
                      CATS, **kw)
           .to_pandas().sort_values("k").reset_index(drop=True))
    return got


def test_matches_brute_force(ray_session):
    df = _rand_df()
    got, ref = _run(df), _brute(df)
    assert list(got.columns) == list(ref.columns)
    for c in got.columns:
        np.testing.assert_allclose(got[c].to_numpy(dtype=float),
                                   ref[c].to_numpy(dtype=float), atol=1e-9)
    for c in CATS:
        assert got[f"{c}_cnt"].dtype == np.int64


def test_missing_category_zero_filled(ray_session):
    # no 'c' rows at all: the column still exists, all zeros
    df = _rand_df()
    df = df[df["cat"] != "c"].reset_index(drop=True)
    got = _run(df)
    assert (got["c_sum"] == 0.0).all() and (got["c_cnt"] == 0).all()
    ref = _brute(df)
    np.testing.assert_allclose(got["a_sum"], ref["a_sum"], atol=1e-9)


def test_strict_raises_on_undeclared(ray_session):
    df = _rand_df()
    df.loc[3, "cat"] = "zzz"
    with pytest.raises(Exception, match="undeclared|zzz"):
        _run(df)


def test_non_strict_ignores_undeclared(ray_session):
    df = _rand_df(seed=2)
    extra = pd.DataFrame({"k": [1, 2], "cat": ["zzz", "yyy"],
                          "v": [100.0, 200.0]})
    got = _run(pd.concat([df, extra], ignore_index=True), strict=False)
    ref = _brute(df)
    for c in got.columns:
        np.testing.assert_allclose(got[c].to_numpy(dtype=float),
                                   ref[c].to_numpy(dtype=float), atol=1e-9)


def test_duplicate_categories_raise(ray_session):
    df = _rand_df()
    with pytest.raises(ValueError, match="duplicate"):
        pivot_wide(rd.from_pandas(df), "k", "cat", "v", ["a", "a"])
