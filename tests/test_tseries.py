"""Delta-of-delta timestamp codec (stages/tseries.py)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from searchengine_ray.stages.tseries import (
    decode_ts_blocks, encode_ts_blocks, unzigzag, zigzag)


def test_zigzag_roundtrip_and_order():
    # bijective over the encodable domain |v| <= 2^62 - 1
    v = np.array([0, -1, 1, -2, 2, 2**62 - 1, -(2**62) + 1, 10**15,
                  -(10**15)], dtype=np.int64)
    z = zigzag(v)
    assert (z[:5] == np.array([0, 1, 2, 3, 4])).all()  # the canonical map
    assert (z >= 0).all()                              # encodable
    np.testing.assert_array_equal(unzigzag(z), v)
    # out-of-domain values wrap negative → encode_stream raises loudly
    from searchengine_ray.functions.varint import encode_stream
    with pytest.raises(ValueError, match="non-negative"):
        encode_stream(zigzag(np.array([2**62], dtype=np.int64)))


def _roundtrip(df, nblocks=4):
    blocks = encode_ts_blocks(rd.from_pandas(df).repartition(nblocks))
    got = (decode_ts_blocks(blocks).to_pandas()
           .sort_values(["key", "ts_us"], kind="mergesort")
           .reset_index(drop=True))
    return blocks, got


def test_roundtrip_random_and_adversarial(ray_session):
    rng = np.random.default_rng(37)
    rows = []
    for uid in range(40):
        n = int(rng.integers(1, 60))
        if uid % 3 == 0:        # metronomic (the Gorilla sweet spot)
            ts = 10**15 + uid + np.arange(n, dtype=np.int64) * 60_000_000
        elif uid % 3 == 1:      # irregular
            ts = np.sort(rng.integers(10**15, 10**15 + 10**10, n))
        else:                   # duplicates + bursts
            ts = np.sort(np.repeat(
                rng.integers(10**15, 10**15 + 10**6, max(n // 2, 1)), 2))[:n]
        rows.append(pd.DataFrame({
            "user_id": np.full(len(ts), uid, dtype=np.int64),
            "ts_us": ts.astype(np.int64)}))
    df = pd.concat(rows, ignore_index=True).sample(frac=1, random_state=1)
    _, got = _roundtrip(df)
    ref = (df.sort_values(["user_id", "ts_us"], kind="mergesort")
           .reset_index(drop=True))
    np.testing.assert_array_equal(got["key"].to_numpy(),
                                  ref["user_id"].to_numpy())
    np.testing.assert_array_equal(got["ts_us"].to_numpy(),
                                  ref["ts_us"].to_numpy())


def test_regular_series_compresses_near_one_byte_per_point(ray_session):
    n = 5000
    df = pd.DataFrame({
        "user_id": np.zeros(n, dtype=np.int64),
        "ts_us": 10**15 + np.arange(n, dtype=np.int64) * 15_000_000})
    blocks, got = _roundtrip(df, 1)
    blob = blocks.to_pandas()["blob"].iloc[0]
    # ΔΔ = 0 after the 2nd point → 1 byte each; header + ts0 + first Δ
    assert len(blob) < n + 32, len(blob)
    assert len(blob) < 8 * n / 6          # ≥6× vs fixed 8-byte int64
    np.testing.assert_array_equal(got["ts_us"].to_numpy(),
                                  df["ts_us"].to_numpy())


def test_single_point_and_empty(ray_session):
    df = pd.DataFrame({"user_id": np.array([7], dtype=np.int64),
                       "ts_us": np.array([123456789], dtype=np.int64)})
    blocks, got = _roundtrip(df, 1)
    assert got["ts_us"].tolist() == [123456789]
    assert blocks.to_pandas()["n"].tolist() == [1]


def test_corrupt_blob_raises(ray_session):
    df = pd.DataFrame({"user_id": np.zeros(5, dtype=np.int64),
                       "ts_us": (10**15 + np.arange(5) * 1000)
                       .astype(np.int64)})
    blocks = encode_ts_blocks(rd.from_pandas(df)).to_pandas()
    bad = blocks.copy()
    bad.loc[0, "blob"] = bad.loc[0, "blob"][:-1]  # truncate
    with pytest.raises(Exception, match="truncated|mismatch"):
        decode_ts_blocks(rd.from_pandas(bad)).to_pandas()
    bad2 = blocks.copy()
    bad2.loc[0, "n"] = 99                          # header lie
    with pytest.raises(Exception, match="mismatch|truncated|index"):
        decode_ts_blocks(rd.from_pandas(bad2)).to_pandas()
