"""Relational helpers: map-side pre-aggregation and broadcast joins.

The scale idioms (SURVEY.md §4):

- ``pre_aggregate``: a bare ``groupby(k).aggregate(...)`` shuffles every row;
  this helper combines inside ``map_batches`` first (one row per key per
  batch) and shuffles only the partials — the reduce-side analog of the
  reference's driver-side merge (``index_construction.py:173-211``) but
  distributed.
- ``broadcast_join``: small dimension tables are ``ray.put`` once and mapped
  in per batch — never a shuffle join (reference J2 pattern,
  ``retrieve_query.py:186-187``).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
import ray
from ray.data import Dataset

_PARTIAL_OPS = {"sum", "count", "min", "max"}


def pre_aggregate(
    ds: Dataset,
    keys: Sequence[str],
    specs: dict[str, tuple[str | None, str]],
    batch_size: int = 65536,
) -> Dataset:
    """Grouped aggregation with map-side combine.

    ``specs``: ``{out_col: (src_col, op)}`` with op ∈ sum|count|min|max
    (count ignores src_col).  Returns a Dataset with columns
    ``[*keys, *specs]``.  Partials are combined per batch (pandas groupby —
    the batch fits in memory by construction), then a small hash shuffle
    merges them: sum/count partials merge with Sum, min with Min, max with
    Max.
    """
    keys = list(keys)
    for out, (_, op) in specs.items():
        if op not in _PARTIAL_OPS:
            raise ValueError(f"unsupported op {op!r} for {out!r}")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        gb = df.groupby(keys, as_index=False, sort=False, observed=True)
        named = {}
        for out, (src, op) in specs.items():
            if op == "count":
                named[out] = pd.NamedAgg(column=keys[0], aggfunc="size")
            else:
                named[out] = pd.NamedAgg(column=src, aggfunc=op)
        return gb.agg(**named)

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)

    # Final merge: hash-bucket the (already small) partials and run one
    # vectorized pandas groupby per bucket.  Measured ~16× faster than
    # ``Dataset.groupby(keys).aggregate(...)`` (multi-key, 40k groups:
    # 10.6s → 0.7s at sf0.1) — the shuffle moves the same rows, but the
    # reduce side is one pandas kernel per bucket instead of per-group
    # machinery.
    merge_ops = {out: ("sum" if op in ("sum", "count") else op)
                 for out, (_, op) in specs.items()}

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        h = np.zeros(len(df), dtype=np.uint64)
        for k in keys:
            h = h * np.uint64(1000003) + pd.util.hash_pandas_object(
                df[k], index=False).to_numpy(dtype=np.uint64)
        df["_bucket"] = (h % np.uint64(64)).astype("int64")
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(keys, as_index=False, sort=False).agg(
            **{o: pd.NamedAgg(column=o, aggfunc=op) for o, op in merge_ops.items()}
        )
        return out

    return (
        partials.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(merge, batch_format="pandas")
    )


def broadcast_join(
    ds: Dataset,
    dim: pd.DataFrame,
    on: str | list[str],
    how: str = "left",
    batch_size: int = 65536,
) -> Dataset:
    """Map-side join of ``ds`` against a SMALL dimension DataFrame.

    ``dim`` is put in the object store once; each batch merges against it —
    no shuffle of the big side.  At cluster scale, every task reads the same
    object-store copy (zero-copy within a node, one transfer per node)."""
    ref = ray.put(dim)

    class JoinFn:
        def __init__(self):
            self.dim = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch.merge(self.dim, on=on, how=how)

    return ds.map_batches(
        JoinFn, batch_format="pandas", batch_size=batch_size, concurrency=(1, 8)
    )


def broadcast_semi_filter(
    ds: Dataset,
    keys: set,
    col: str,
    keep: bool = True,
    batch_size: int = 65536,
) -> Dataset:
    """Semi (keep=True) / anti (keep=False) join via a broadcast key set."""
    ref = ray.put(keys)

    class FilterFn:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            mask = df[col].isin(self.keys)
            return df[mask] if keep else df[~mask]

    return ds.map_batches(
        FilterFn, batch_format="pandas", batch_size=batch_size, concurrency=(1, 8)
    )
