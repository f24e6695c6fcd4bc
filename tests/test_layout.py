"""Z-order layout: Morton-code correctness, row preservation, and the
2-D box-pruning win over a single-column sort (the operator's reason to
exist) measured from real parquet row-group statistics."""

import os
import shutil

import numpy as np
import pandas as pd
import pytest

from searchengine_ray.sources.layout import (box_pruning_stats,
                                             morton_interleave, zorder_write)

SCRATCH = "/tmp/graft_scratch/test_layout"


def test_morton_interleave_bits():
    x = np.array([0b101, 0b000, 0xFFFF], dtype=np.int64)
    y = np.array([0b011, 0b000, 0xFFFF], dtype=np.int64)
    z = morton_interleave(x, y)
    assert z[0] == 0b011011  # x bits even (1,0,1), y bits odd (0,1,1)
    assert z[1] == 0
    assert z[2] == (1 << 32) - 1
    # locality: neighbors in both dims are close in z
    assert morton_interleave(np.array([3]), np.array([3]))[0] == 0b1111


def _mk(n=40_000, seed=4):
    rng = np.random.RandomState(seed)
    return pd.DataFrame({
        "x": rng.randint(0, 1000, n).astype(np.int64),
        "y": rng.uniform(0.0, 1000.0, n),
        "payload": np.arange(n, dtype=np.int64)})


def test_zorder_roundtrip_and_pruning(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    df = _mk()
    zdir, xdir = f"{SCRATCH}/z", f"{SCRATCH}/xsort"
    for d in (zdir, xdir):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
    ds = rd.from_pandas(df).repartition(8).materialize()
    zorder_write(ds, zdir, "x", "y", rows_per_group=1024)
    # baseline: the same data clustered by x ONLY, same granule size
    ds.sort("x").write_parquet(xdir, row_group_size=1024)

    # every row survives the layout, bit-exact
    got = pd.concat(
        [pq.read_table(f"{zdir}/{n}").to_pandas()
         for n in sorted(os.listdir(zdir)) if n.endswith(".parquet")],
        ignore_index=True).sort_values("payload").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["x", "y", "payload"]],
        df.sort_values("payload").reset_index(drop=True))

    # the case a single-column sort CANNOT prune: wide in x (50% of the
    # axis — half of every x-sorted granule qualifies) but narrow in y
    box_x, box_y = (0, 499), (400.0, 499.0)
    z_stats = box_pruning_stats(zdir, "x", "y", box_x, box_y)
    x_stats = box_pruning_stats(xdir, "x", "y", box_x, box_y)
    # block-boundary effects can shift the group count by ±1 between
    # layouts; compare touched FRACTIONS at the same granule size
    assert abs(z_stats["row_groups"] - x_stats["row_groups"]) <= 2
    # x-sorted prunes on x but must touch every group in the x range
    # regardless of y; z-order prunes on both axes at once
    zf = z_stats["touched"] / z_stats["row_groups"]
    xf = x_stats["touched"] / x_stats["row_groups"]
    assert zf < xf / 2, (z_stats, x_stats)
    assert z_stats["pruned_frac"] > 0.8, z_stats


def test_zorder_degenerate_extent(ray_session):
    import ray.data as rd

    df = _mk(2000)
    df["x"] = 7  # zero x-extent: everything quantizes to 0, still valid
    d = f"{SCRATCH}/deg"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    (xr, yr) = zorder_write(rd.from_pandas(df), d, "x", "y",
                            rows_per_group=512)
    assert xr == (7.0, 7.0)
    stats = box_pruning_stats(d, "x", "y", (0, 100), (0.0, 50.0))
    assert stats["row_groups"] >= 2  # multiple granules written
