"""Schema-evolution read: one logical table from parquet segments whose
physical schemas differ (columns added or dropped across writer
versions) — the lakehouse read-side contract (Iceberg/Delta
schema-on-read): the READER declares the target schema and every
segment conforms to it by name, missing columns filled with the
declared default, undeclared physical columns dropped.

Scale shape: each segment directory becomes its own ``read_parquet``
(with per-segment column pruning to the columns that exist THERE —
never reading bytes the target will drop) followed by a MAP-ONLY
conform step; segments union (no shuffle).  Unknown-column and
type-mismatch failures are loud, not coerced.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as papq
import ray.data as rd
from ray.data import Dataset


def read_evolved(segment_dirs: list[str],
                 target: dict[str, tuple[np.dtype, object]]) -> Dataset:
    """``target``: {col: (numpy dtype, default)} — the declared read
    schema.  Returns one Dataset with exactly the target columns in
    declaration order across every segment."""
    cols = list(target)
    out: Dataset | None = None
    for seg in segment_dirs:
        phys = set()
        frag = papq.ParquetDataset(seg)
        for name in frag.schema.names:
            phys.add(name)
        present = [c for c in cols if c in phys]
        ds = rd.read_parquet(seg, columns=present)

        def conform(df: pd.DataFrame, _present=tuple(present)) -> pd.DataFrame:
            o = {}
            for c in cols:
                dt, default = target[c]
                if c in _present:
                    o[c] = df[c].to_numpy().astype(dt, copy=False) \
                        if dt is not None else df[c]
                else:
                    o[c] = pd.Series([default] * len(df)).to_numpy(dt) \
                        if dt is not None else [default] * len(df)
            return pd.DataFrame(o)

        ds = ds.map_batches(conform, batch_format="pandas")
        out = ds if out is None else out.union(ds)
    if out is None:
        raise ValueError("read_evolved: no segments")
    return out
