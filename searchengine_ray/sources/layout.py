"""Z-order (Morton) data layout — multi-dimensional clustering for scan
pruning, the lakehouse ``OPTIMIZE ZORDER BY`` step.

Sorting a table by ONE column prunes row groups for predicates on that
column only; a 100-TB table queried by (user, time) boxes or (lat, lon)
windows needs locality in BOTH dimensions at once.  Interleaving the
bits of the two (range-normalized) key columns gives a 1-D sort key
whose order is a space-filling curve: rows close in (x, y) land in the
same row groups, so parquet min/max statistics prune 2-D box predicates
on both axes.

Shape: one scalar extent pass (per-batch min/max partials), a map-only
Morton encode (vectorized 16-bit interleave), ONE range-partition sort
(the same all-to-all any global layout costs), and a row-grouped
parquet write.  Nothing row-scaled touches the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_BITS = 16


def morton_interleave(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized 2×16-bit Morton code: x in even bits, y in odd.
    Inputs must already be quantized to [0, 2^16) int64."""
    z = np.zeros(len(x), dtype=np.int64)
    for b in range(_BITS):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def _quantize(v: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """Range-normalize to [0, 2^16 − 1]; degenerate extent → 0."""
    if hi <= lo:
        return np.zeros(len(v), dtype=np.int64)
    q = np.floor((v.astype(np.float64) - lo) * float((1 << _BITS) - 1)
                 / (hi - lo))
    return np.clip(q, 0, (1 << _BITS) - 1).astype(np.int64)


def zorder_write(ds, out_dir: str, x_col: str, y_col: str,
                 rows_per_group: int = 4096):
    """Write ``ds`` to ``out_dir`` clustered by the Z-order of
    (x_col, y_col), ``rows_per_group`` rows per parquet row group (the
    pruning granule).  Returns the (lo, hi) extents used, so queries can
    quantize predicates the same way."""

    def extent(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({c: pd.Series([], dtype=np.float64)
                                 for c in ("xlo", "xhi", "ylo", "yhi")})
        x = df[x_col].to_numpy(np.float64)
        y = df[y_col].to_numpy(np.float64)
        return pd.DataFrame({"xlo": [x.min()], "xhi": [x.max()],
                             "ylo": [y.min()], "yhi": [y.max()]})

    ext = ds.map_batches(extent, batch_format="pandas").to_pandas()
    xlo, xhi = float(ext["xlo"].min()), float(ext["xhi"].max())
    ylo, yhi = float(ext["ylo"].min()), float(ext["yhi"].max())

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_z"] = morton_interleave(
            _quantize(df[x_col].to_numpy(), xlo, xhi),
            _quantize(df[y_col].to_numpy(), ylo, yhi))
        return df

    (ds.map_batches(encode, batch_format="pandas")
     .sort("_z")
     .drop_columns(["_z"])
     .write_parquet(out_dir, row_group_size=rows_per_group))
    return (xlo, xhi), (ylo, yhi)


def box_pruning_stats(data_dir: str, x_col: str, y_col: str,
                      x_range: tuple, y_range: tuple) -> dict:
    """How much a 2-D box predicate prunes on this layout: row groups
    whose parquet min/max statistics overlap the box vs total.  O(row
    groups) metadata only — no data read."""
    import os

    import pyarrow.parquet as pq

    total = touched = 0
    for name in sorted(os.listdir(data_dir)):
        if not name.endswith(".parquet"):
            continue
        meta = pq.ParquetFile(os.path.join(data_dir, name)).metadata
        sch = {meta.schema.column(i).name: i
               for i in range(meta.num_columns)}
        xi, yi = sch[x_col], sch[y_col]
        for g in range(meta.num_row_groups):
            total += 1
            sx = meta.row_group(g).column(xi).statistics
            sy = meta.row_group(g).column(yi).statistics
            if (sx.min <= x_range[1] and sx.max >= x_range[0]
                    and sy.min <= y_range[1] and sy.max >= y_range[0]):
                touched += 1
    return {"row_groups": total, "touched": touched,
            "pruned_frac": round(1.0 - touched / total, 4) if total else 0.0}
