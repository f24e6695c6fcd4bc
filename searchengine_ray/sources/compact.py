"""Small-file compaction — the lakehouse OPTIMIZE / bin-packing step.

A streaming engine writing per-block output (this repo's sinks included)
leaves thousands of small parquet files behind; reads then pay per-file
open/footer costs instead of sequential scans (measured in this repo:
the pre-co-location IVF index at 904 tiny files probed 3× slower than
the 16-file layout).  Compaction rewrites a directory into files near a
target byte size WITHOUT changing a row.

Shape:
- the driver holds only the file LISTING (path, bytes) — O(files), never
  rows — and bin-packs it first-fit-decreasing into groups ≤ target;
- each group is one distributed task (``map_batches`` over the group
  table): read its files with pyarrow, concat, write ONE output file
  atomically (tmp + os.replace).  Oversized inputs pass through as their
  own group (compaction never splits a file — that is a repartition).
- outputs are deterministic: groups are formed from the sorted listing
  and named ``part-{gid:05d}.parquet``, rows keep listing order inside a
  group — so re-running compaction is bit-identical.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd


def plan_bins(sizes: list[tuple[str, int]], target_bytes: int,
              ) -> list[list[str]]:
    """First-fit-decreasing bin packing of (path, bytes) into groups whose
    total is ≤ ``target_bytes`` (a single file larger than the target gets
    its own group).  Deterministic: ties break on path."""
    order = sorted(sizes, key=lambda s: (-s[1], s[0]))
    bins: list[tuple[int, list[str]]] = []
    for path, sz in order:
        for i, (used, members) in enumerate(bins):
            if used + sz <= target_bytes:
                bins[i] = (used + sz, members + [path])
                break
        else:
            bins.append((sz, [path]))
    # stable output order: by first (lexicographically smallest) member
    return [sorted(members) for _, members in
            sorted(bins, key=lambda b: min(b[1]))]


def compact_files(in_dir: str, out_dir: str,
                  target_bytes: int = 256 * 1024 * 1024) -> pd.DataFrame:
    """Compact every ``*.parquet`` under ``in_dir`` (non-recursive) into
    ``out_dir``; returns the O(groups) manifest DataFrame
    (group_id, n_files, rows, bytes).  Distributed: one task per group;
    the driver never touches a data row."""
    import ray
    import ray.data as rd

    names = sorted(n for n in os.listdir(in_dir) if n.endswith(".parquet"))
    if not names:
        raise ValueError(f"compact_files: no parquet files in {in_dir}")
    listing = [(os.path.join(in_dir, n),
                os.path.getsize(os.path.join(in_dir, n))) for n in names]
    groups = plan_bins(listing, target_bytes)
    os.makedirs(out_dir, exist_ok=True)

    spec = pd.DataFrame({
        "gid": np.arange(len(groups), dtype=np.int64),
        "paths": ["\n".join(g) for g in groups]})
    out_ref = ray.put(out_dir)

    def rewrite(df: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.parquet as pq

        odir = ray.get(out_ref)
        rows_out, bytes_out, nf = [], [], []
        for gid, blob in zip(df["gid"], df["paths"]):
            paths = blob.split("\n")
            tbl = pa.concat_tables([pq.read_table(p) for p in paths])
            dst = os.path.join(odir, f"part-{int(gid):05d}.parquet")
            tmp = f"{dst}.tmp.{os.getpid()}"
            pq.write_table(tbl, tmp)
            os.replace(tmp, dst)
            rows_out.append(tbl.num_rows)
            bytes_out.append(os.path.getsize(dst))
            nf.append(len(paths))
        return pd.DataFrame({"group_id": df["gid"].to_numpy(np.int64),
                             "n_files": np.array(nf, dtype=np.int64),
                             "rows": np.array(rows_out, dtype=np.int64),
                             "bytes": np.array(bytes_out, dtype=np.int64)})

    manifest = (rd.from_pandas(spec).repartition(max(1, min(len(groups), 32)))
                .map_batches(rewrite, batch_format="pandas")
                .to_pandas())
    return manifest.sort_values("group_id").reset_index(drop=True)
