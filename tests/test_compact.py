"""Small-file compaction: bin-packing plan properties, content equality
(row-exact, order-deterministic), oversized pass-through, idempotence."""

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from searchengine_ray.sources.compact import compact_files, plan_bins

SCRATCH = "/tmp/graft_scratch/test_compact"


def _write_small(in_dir: str, n_files=12, rows=50):
    shutil.rmtree(in_dir, ignore_errors=True)
    os.makedirs(in_dir)
    frames = []
    for i in range(n_files):
        df = pd.DataFrame({
            "doc_id": np.arange(i * rows, (i + 1) * rows, dtype=np.int64),
            "text": [f"doc {i}.{j} " + "x" * (j % 17) for j in range(rows)]})
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       f"{in_dir}/f{i:03d}.parquet")
        frames.append(df)
    return pd.concat(frames, ignore_index=True)


def test_plan_bins_packing():
    sizes = [(f"p{i}", s) for i, s in
             enumerate([700, 300, 300, 300, 200, 1500])]
    bins = plan_bins(sizes, target_bytes=1000)
    # every bin under target except the oversized singleton
    flat = [p for b in bins for p in b]
    assert sorted(flat) == sorted(p for p, _ in sizes)
    by_size = dict(sizes)
    for b in bins:
        tot = sum(by_size[p] for p in b)
        assert tot <= 1000 or len(b) == 1
    assert ["p5"] in bins  # 1500 > target: its own group, never split
    # deterministic
    assert bins == plan_bins(list(reversed(sizes)), 1000)


def test_compact_roundtrip_and_reduction(ray_session):
    in_dir, out_dir = f"{SCRATCH}/in", f"{SCRATCH}/out"
    want = _write_small(in_dir)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    total = sum(os.path.getsize(f"{in_dir}/{n}") for n in os.listdir(in_dir))
    manifest = compact_files(in_dir, out_dir, target_bytes=total // 3 + 1)
    outs = sorted(n for n in os.listdir(out_dir) if n.endswith(".parquet"))
    assert 1 < len(outs) < 12  # genuinely compacted, multiple groups
    assert len(outs) == len(manifest)
    assert manifest["rows"].sum() == len(want)
    assert not any(n.endswith(".tmp") for n in os.listdir(out_dir))
    got = (pd.concat([pq.read_table(f"{out_dir}/{n}").to_pandas()
                      for n in outs], ignore_index=True)
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want.sort_values("doc_id")
                                  .reset_index(drop=True))
    # idempotent: re-running produces byte-identical outputs
    sig1 = {n: open(f"{out_dir}/{n}", "rb").read() for n in outs}
    compact_files(in_dir, out_dir, target_bytes=total // 3 + 1)
    sig2 = {n: open(f"{out_dir}/{n}", "rb").read()
            for n in sorted(os.listdir(out_dir)) if n.endswith(".parquet")}
    assert sig1 == sig2


def test_compact_empty_dir_raises(ray_session):
    d = f"{SCRATCH}/empty"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    with pytest.raises(ValueError, match="no parquet"):
        compact_files(d, f"{SCRATCH}/never", target_bytes=100)
