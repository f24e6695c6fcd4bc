"""Table profiling: per-column statistics in one streaming pass (+ one
small shuffle for distinct counts).

The "profile this table before you process 100 TB of it" utility op: row
count, null count, distinct count, min/max per column.  Counts and typed
extremes reduce through per-batch scalar partials (driver sees
columns × batches rows, never data rows); distinct counting co-shuffles
ONE row per distinct (column, value-hash) pair per batch — the exact
path (the HLL sketch in stages/sketches.py is the unbounded-cardinality
alternative; hash-collision caveat is the usual 2^-64 contract).
min/max report as strings so heterogeneous column types share one output
schema (the SQL mirror casts the same way).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset

from searchengine_ray.stages.relational import bucketed_apply, pre_aggregate


def _fmt(v) -> str:
    """Rendering that matches DuckDB's CAST(x AS VARCHAR) for the profiled
    types: str(float) keeps the trailing .0 exactly like DuckDB ('24.0'),
    str(pd.Timestamp) prints 'YYYY-MM-DD HH:MM:SS' like a DuckDB
    timestamp cast."""
    return str(v)


def table_profile(ds: Dataset, columns: list[str]) -> Dataset:
    """Returns one row per profiled column:
    (column, n_rows, n_null, n_distinct, min_v, max_v)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in columns:
            s = df[c]
            sv = s.dropna()
            rows.append({"column": c, "n_rows": len(s),
                         "n_null": int(s.isna().sum()),
                         "mn": sv.min() if len(sv) else None,
                         "mx": sv.max() if len(sv) else None})
        return pd.DataFrame(rows)

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536).to_pandas()

    # distinct counts: one (column, hash) row per distinct value per batch,
    # co-shuffled so each hash is counted once globally
    def dhash(df: pd.DataFrame) -> pd.DataFrame:
        cols, hs = [], []
        for ci, c in enumerate(columns):
            u = df[c].dropna().drop_duplicates()
            h = np.unique(pd.util.hash_pandas_object(
                u, index=False, categorize=False).to_numpy(
                dtype=np.uint64).view(np.int64))
            hs.append(h)
            cols.append(np.full(h.size, ci, dtype=np.int64))
        if not cols:
            return pd.DataFrame({"ci": pd.Series([], dtype=np.int64),
                                 "h": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"ci": np.concatenate(cols),
                             "h": np.concatenate(hs)})

    def count_distinct(g: pd.DataFrame) -> pd.DataFrame:
        u = g.drop_duplicates(["ci", "h"])
        return (u.groupby("ci", sort=False, as_index=False)
                .agg(nd=("h", "size")))

    nd_parts = bucketed_apply(
        ds.map_batches(dhash, batch_format="pandas", batch_size=65536),
        ["ci", "h"], count_distinct)
    nd = pre_aggregate(nd_parts, ["ci"],
                       {"n_distinct": ("nd", "sum")}).to_pandas()
    nd_map = dict(zip(nd["ci"], nd["n_distinct"]))

    out_rows = []
    for ci, c in enumerate(columns):
        g = parts[parts["column"] == c]
        mn, mx = g["mn"].dropna(), g["mx"].dropna()
        out_rows.append({
            "column": c,
            "n_rows": np.int64(g["n_rows"].sum()),
            "n_null": np.int64(g["n_null"].sum()),
            "n_distinct": np.int64(nd_map.get(ci, 0)),
            "min_v": _fmt(mn.min()) if len(mn) else None,
            "max_v": _fmt(mx.max()) if len(mx) else None,
        })
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame(out_rows))


def grouped_histogram(
    ds: Dataset, group_col: str, value_col: str, bins: int = 20,
) -> Dataset:
    """Fixed-bin value histogram PER GROUP — the distribution profile
    table_profile's min/max can't show (skew, modality, outlier mass).

    Two streaming passes, zero data-row driver traffic:
    1. global [lo, hi] from per-batch scalar partials (one row per batch);
    2. map-side binify + per-batch combine, reduced through ONE
       ``pre_aggregate`` — the shuffle carries ≤ groups × bins rows per
       batch, never events.

    bin = min(floor((v − lo) · bins / (hi − lo)), bins − 1), evaluated in
    the same operation order as the SQL mirror so both sides floor the
    same doubles.  Degenerate hi == lo puts everything in bin 0."""

    def batch_extent(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"lo": pd.Series([], dtype=np.float64),
                                 "hi": pd.Series([], dtype=np.float64)})
        v = df[value_col].to_numpy(np.float64)
        return pd.DataFrame({"lo": [float(v.min())], "hi": [float(v.max())]})

    ext = ds.map_batches(batch_extent, batch_format="pandas").to_pandas()
    lo, hi = float(ext["lo"].min()), float(ext["hi"].max())
    span = hi - lo

    def binify(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy(np.float64)
        if span > 0:
            b = np.minimum(np.floor((v - lo) * float(bins) / span),
                           bins - 1).astype(np.int64)
        else:
            b = np.zeros(len(df), dtype=np.int64)
        return pd.DataFrame({group_col: df[group_col], "bin": b})

    binned = ds.map_batches(binify, batch_format="pandas")
    return pre_aggregate(binned, [group_col, "bin"], {"n": (None, "count")})


def value_rank_normalize(
    ds: Dataset, value_col: str, id_col: str,
    num_buckets: int = 256,
) -> Dataset:
    """Quantile (rank) normalization — the percent_rank feature
    transform: every row gets pct = (global rank − 1)/(n − 1) under the
    unique order (value, id), mapping any distribution onto [0, 1]
    (rank-gauss / quantile-transform preprocessing).

    A GLOBAL value order without a global sort (the ``late_data_stats``
    range-bucket discipline, keyed by VALUE instead of arrival): one
    scalar pass gets (lo, hi, n); buckets assign map-only from those two
    scalars; per-bucket counts reduce to O(B) driver rows whose
    exclusive prefix sum broadcasts back as each bucket's rank carry-in;
    ONE co-shuffle then ranks each bucket with a vectorized sort.  The
    division (int64 rank)/(n−1) is one correctly-rounded double op, so
    engine and SQL ``percent_rank()`` agree bit-for-bit — no rounding
    margin needed.

    Range buckets assume the value distribution is not pathologically
    concentrated (a single repeated value lands one bucket with
    everything — the fix at scale is equi-depth cuts from
    ``exact_global_quantile``, not a bigger B); ties across rows are
    broken by ``id_col`` so the order is total.  n = 1 maps to pct 0
    (the SQL percent_rank convention)."""
    import ray

    def scalar_partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy(np.float64)
        return pd.DataFrame({"lo": [v.min() if len(v) else np.inf],
                             "hi": [v.max() if len(v) else -np.inf],
                             "n": [len(v)]})

    ds = ds.materialize()  # consumed by the scalar pass + count + rank pass
    st = ds.map_batches(scalar_partial, batch_format="pandas").to_pandas()
    lo = float(st["lo"].min())
    hi = float(st["hi"].max())
    n = int(st["n"].sum())
    if n == 0:
        return ds.map_batches(
            lambda df: pd.DataFrame({
                id_col: pd.Series([], dtype=np.int64),
                value_col: pd.Series([], dtype=np.float64),
                "pct": pd.Series([], dtype=np.float64)}),
            batch_format="pandas")
    span = hi - lo
    B = num_buckets

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy(np.float64)
        if span > 0:
            b = np.clip(((v - lo) * B / span).astype(np.int64), 0, B - 1)
        else:
            b = np.zeros(len(v), np.int64)
        return pd.DataFrame({"_rb": b,
                             id_col: df[id_col].to_numpy(np.int64),
                             value_col: v})

    assigned = ds.map_batches(assign, batch_format="pandas").materialize()
    cnt = (pre_aggregate(assigned, ["_rb"], {"c": (None, "count")})
           .to_pandas().sort_values("_rb"))
    carry = np.zeros(B, dtype=np.int64)
    carry[cnt["_rb"].to_numpy(np.int64)] = cnt["c"].to_numpy(np.int64)
    carry = np.concatenate([[0], np.cumsum(carry)[:-1]])
    carry_ref = ray.put(carry)
    denom = float(max(n - 1, 1))

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):  # empty-probe call from bucketed_map_groups
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 value_col: pd.Series([], dtype=np.float64),
                                 "pct": pd.Series([], dtype=np.float64)})
        ca = ray.get(carry_ref)
        g = g.sort_values([value_col, id_col], kind="mergesort")
        b = int(g["_rb"].iloc[0])  # co-shuffled whole: one bucket per group
        r0 = ca[b] + np.arange(len(g), dtype=np.int64)  # rank − 1
        return pd.DataFrame({id_col: g[id_col].to_numpy(np.int64),
                             value_col: g[value_col].to_numpy(np.float64),
                             "pct": r0 / denom})

    from searchengine_ray.stages.relational import bucketed_map_groups

    return bucketed_map_groups(assigned, ["_rb"], rank_bucket)
