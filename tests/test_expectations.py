"""Data-quality expectation suite (stages/expectations.py)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from searchengine_ray.stages.expectations import data_quality_checks


def _ds(df, nblocks=4):
    return rd.from_pandas(df).repartition(nblocks)


def test_all_kinds_with_planted_violations(ray_session):
    df = pd.DataFrame({
        "id": np.array([0, 1, 2, 2, 4, 5], dtype=np.int64),   # dup surplus 1
        "u": [1.0, 2.0, np.nan, 4.0, np.nan, 6.0],            # 2 nulls
        "v": np.array([-3.0, 0.0, 5.0, 99.0, 101.0, 7.0]),    # min<0, max>100
        "t": ["a", "a", "b", "zz", "b", "qq"]})               # 2 outside set
    got = data_quality_checks(_ds(df), [
        ("rows", "row_count_ge", None, 10),
        ("u_nn", "not_null", "u", None),
        ("id_uq", "unique", "id", None),
        ("v_min", "min_ge", "v", 0.0),
        ("v_max", "max_le", "v", 100.0),
        ("t_set", "in_set", "t", ["a", "b"]),
    ])
    byname = got.set_index("check")
    assert byname.loc["rows", "metric"] == 6.0
    assert not byname.loc["rows", "passed"]          # 6 < 10
    assert byname.loc["u_nn", "metric"] == 2.0 and not byname.loc["u_nn", "passed"]
    assert byname.loc["id_uq", "metric"] == 1.0 and not byname.loc["id_uq", "passed"]
    assert byname.loc["v_min", "metric"] == -3.0 and not byname.loc["v_min", "passed"]
    assert byname.loc["v_max", "metric"] == 101.0 and not byname.loc["v_max", "passed"]
    assert byname.loc["t_set", "metric"] == 2.0 and not byname.loc["t_set", "passed"]
    # output preserves declaration order
    assert got["check"].tolist() == ["rows", "u_nn", "id_uq",
                                     "v_min", "v_max", "t_set"]


def test_clean_table_passes_everything(ray_session):
    df = pd.DataFrame({
        "id": np.arange(50, dtype=np.int64),
        "v": np.linspace(1.0, 9.0, 50),
        "t": ["a"] * 50})
    got = data_quality_checks(_ds(df), [
        ("rows", "row_count_ge", None, 50),
        ("id_uq", "unique", "id", None),
        ("v_min", "min_ge", "v", 1.0),      # boundary: min == param passes
        ("v_max", "max_le", "v", 9.0),
        ("t_set", "in_set", "t", ["a"]),
    ])
    assert got["passed"].all()


def test_unique_ignores_partitioning(ray_session):
    # a duplicated pair split across blocks must still be found (the
    # pre_aggregate co-shuffle, not a per-block check)
    df = pd.DataFrame({"id": np.r_[np.arange(100),
                                   np.array([7])].astype(np.int64)})
    got = data_quality_checks(_ds(df, 8), [("uq", "unique", "id", None)])
    assert got.iloc[0]["metric"] == 1.0 and not got.iloc[0]["passed"]


def test_unknown_kind_raises(ray_session):
    with pytest.raises(ValueError, match="unknown check kind"):
        data_quality_checks(_ds(pd.DataFrame({"a": [1]})),
                            [("x", "nope", "a", None)])


def test_empty_table_fails_row_count_not_crash(ray_session):
    """An empty dataset is the canonical failure case: it must yield a
    failing row_count_ge VERDICT (and vacuous passes for the rest), not a
    KeyError from the absent partial groups."""
    df = pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                       "b": pd.Series([], dtype=np.float64)})
    out = data_quality_checks(_ds(df, 2), [
        ("rows", "row_count_ge", None, 1),
        ("a_nn", "not_null", "a", None),
        ("b_min", "min_ge", "b", 0.0),
        ("b_max", "max_le", "b", 10.0),
        ("a_set", "in_set", "a", [0, 1]),
        ("a_uni", "unique", "a", None)])
    byname = {r.check: r for r in out.itertuples()}
    assert byname["rows"].passed == False and byname["rows"].metric == 0.0
    for name in ("a_nn", "b_min", "b_max", "a_set", "a_uni"):
        assert byname[name].passed == True
