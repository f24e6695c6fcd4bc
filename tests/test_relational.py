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


def test_anti_empty_right(ray_session):
    left, lds, rds = _mk({"k": [1, 2], "v": ["a", "b"]}, [])
    rds = rd.from_pandas(pd.DataFrame({"k": pd.Series([], dtype="int64")}))
    out = hash_semi_anti_join(lds, rds, on="k", anti=True).to_pandas()
    assert len(out) == 2
