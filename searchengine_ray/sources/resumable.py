"""Resumable partitioned Dataset sink.

At 100 TB a sink must be PARTITION-ATOMIC: a failed run leaves every
finished partition behind a durable marker, and the retry writes only
what's missing — never one giant file, never a full rewrite.  (The
reference persists its whole index as one pickle per run —
idxer.py:147-164 — exactly the shape that cannot resume; the crawl
checkpoints in this repo already follow the manifest-written-last
discipline, this module is the corpus-side generalization.)

Layout under ``out_dir``::

    <partition_col>=<value>/data.parquet       (tmp + rename, atomic)
    <partition_col>=<value>/_SUCCESS           (row count; durable marker)
    _MANIFEST.json                             (written LAST, lists all
                                                partitions = job complete)

Scale contract: one partition is written by one task and must fit a
worker's heap — pick the partition key so corpus/P does (the same bound
as any ``map_groups``).  Skew: a hot partition is one big task; salt the
key upstream if a single value dominates.  The skip-finished filter is
map-only over a broadcast frozenset (O(P), never O(rows), on the driver).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from ray.data import Dataset

_MANIFEST = "_MANIFEST.json"


def _part_dir(out_dir: str, col: str, value) -> str:
    return os.path.join(out_dir, f"{col}={value}")


def finished_partitions(out_dir: str, partition_col: str) -> frozenset:
    """Partition VALUES (as strings) with a durable _SUCCESS marker."""
    if not os.path.isdir(out_dir):
        return frozenset()
    pref = partition_col + "="
    return frozenset(
        d[len(pref):] for d in os.listdir(out_dir)
        if d.startswith(pref)
        and os.path.exists(os.path.join(out_dir, d, "_SUCCESS")))


def resumable_write(
    ds: Dataset,
    out_dir: str,
    partition_col: str,
    order_by: list[str] | None = None,
    on_partition_written=None,
) -> pd.DataFrame:
    """Write ``ds`` as one atomic parquet directory per value of
    ``partition_col``; re-running after a failure SKIPS finished
    partitions (their bytes are never touched again).

    ``order_by`` sorts rows inside each partition so the written bytes
    are deterministic across runs/block orders (required for the
    bit-identical-resume guarantee; without it row order follows block
    arrival).  ``on_partition_written`` is a fault-injection seam called
    inside the write task, after the data file lands but before the
    durable marker (a raise ≡ crash mid-commit).  Returns a small
    driver-side
    frame of per-partition stats — O(P) rows — and writes the top-level
    manifest LAST, so ``_MANIFEST.json``'s existence == job complete.
    """
    os.makedirs(out_dir, exist_ok=True)
    done = finished_partitions(out_dir, partition_col)

    todo = ds
    if done:
        def drop_done(df: pd.DataFrame) -> pd.DataFrame:
            vals = df[partition_col].astype(str)
            return df[~vals.isin(done).to_numpy()]

        todo = ds.map_batches(drop_done, batch_format="pandas")

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        value = str(g[partition_col].iloc[0])
        if order_by:
            g = g.sort_values(order_by, kind="mergesort",
                              ignore_index=True)
        d = _part_dir(out_dir, partition_col, value)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, "data.parquet.tmp")
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False), tmp)
        os.replace(tmp, os.path.join(d, "data.parquet"))
        if on_partition_written is not None:
            # fault-injection seam (runs INSIDE the write task): fires
            # after the data lands but BEFORE the durable marker — a
            # raise here models a crash mid-commit, so the partition
            # reads as unfinished and the retry rewrites it
            on_partition_written(value)
        with open(os.path.join(d, "_SUCCESS.tmp"), "w") as f:
            json.dump({"rows": int(len(g))}, f)
        os.replace(os.path.join(d, "_SUCCESS.tmp"),
                   os.path.join(d, "_SUCCESS"))
        return pd.DataFrame({"partition": [value], "rows": [len(g)],
                             "written": [True]})

    # one write task per partition, co-located whole (the IVF-list write
    # pattern); P is small by construction, so this groupby is cheap
    written = todo.groupby(partition_col).map_groups(
        write_group, batch_format="pandas").to_pandas()
    if not len(written):  # everything already finished
        written = pd.DataFrame({"partition": pd.Series([], dtype=object),
                                "rows": pd.Series([], dtype=np.int64),
                                "written": pd.Series([], dtype=bool)})

    skipped = pd.DataFrame({
        "partition": sorted(done),
        "rows": [_success_rows(out_dir, partition_col, v)
                 for v in sorted(done)],
        "written": [False] * len(done)})
    stats = pd.concat([written, skipped], ignore_index=True)
    stats = stats.sort_values("partition", ignore_index=True)

    # manifest LAST: its existence marks the whole job complete
    manifest = {"partition_col": partition_col,
                "partitions": {str(r.partition): int(r.rows)
                               for r in stats.itertuples()}}
    tmp = os.path.join(out_dir, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, _MANIFEST))
    return stats


def _success_rows(out_dir: str, col: str, value: str) -> int:
    with open(os.path.join(_part_dir(out_dir, col, value), "_SUCCESS")) as f:
        return int(json.load(f)["rows"])


def resumable_read(out_dir: str, require_complete: bool = True):
    """Dataset over the sink's finished partitions.  With
    ``require_complete`` the top-level manifest must exist (i.e. the
    write finished); without it, reads whatever partitions committed —
    the partial-progress view a monitoring job wants."""
    import ray.data as rd

    manifest_path = os.path.join(out_dir, _MANIFEST)
    if require_complete and not os.path.exists(manifest_path):
        raise FileNotFoundError(
            f"sink at {out_dir} is incomplete (no {_MANIFEST})")
    files = []
    for d in sorted(os.listdir(out_dir)):
        full = os.path.join(out_dir, d)
        if (os.path.isdir(full)
                and os.path.exists(os.path.join(full, "_SUCCESS"))):
            files.append(os.path.join(full, "data.parquet"))
    if not files:
        raise FileNotFoundError(f"no finished partitions under {out_dir}")
    return rd.read_parquet(files)
