"""Declarative data-quality expectations — the Deequ/Great-Expectations
shape: a constraint suite verdicts a table in ONE streaming pass.

Profiling (``stages/profile.table_profile``) DESCRIBES a table; this
operator JUDGES it: each check compiles to a scalar aggregate evaluated
from per-batch partials (row count, per-column null / out-of-set /
bounds violations, typed min-max), merged on the driver as O(checks ×
batches) scalars.  Only ``unique`` needs an exchange — one
``pre_aggregate`` on the checked column plus a map-side surplus count,
the same cost as the exact-distinct path in ``table_profile``.  The
corpus streams once for the scalar suite regardless of how many checks
it carries; nothing row-scaled reaches the driver.

Check kinds (name, kind, column, param):
- ``row_count_ge``: table rows ≥ param
- ``not_null``:     zero NULLs in column
- ``unique``:       zero duplicated values in column (NULLs ignored)
- ``min_ge``:       min(column) ≥ param
- ``max_le``:       max(column) ≤ param
- ``in_set``:       zero values outside param (an allowed-set list)

Output: one row per check — (check, metric float64, passed bool) where
metric is the violation count (not_null/unique/in_set), the observed
extreme (min_ge/max_le), or the row count (row_count_ge).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset

from searchengine_ray.stages.relational import pre_aggregate


def data_quality_checks(ds: Dataset, checks: list[tuple],
                        batch_size: int = 65536) -> pd.DataFrame:
    for name, kind, col, param in checks:
        if kind not in ("row_count_ge", "not_null", "unique", "min_ge",
                        "max_le", "in_set"):
            raise ValueError(f"unknown check kind {kind!r} ({name})")

    scalar = [(n, k, c, p) for n, k, c, p in checks if k != "unique"]
    uniq = [(n, k, c, p) for n, k, c, p in checks if k == "unique"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vals = []
        for name, kind, col, param in scalar:
            if kind == "row_count_ge":
                vals.append(float(len(df)))
            elif kind == "not_null":
                vals.append(float(df[col].isna().sum()))
            elif kind == "min_ge":
                s = df[col].dropna()
                vals.append(float(s.min()) if len(s) else np.inf)
            elif kind == "max_le":
                s = df[col].dropna()
                vals.append(float(s.max()) if len(s) else -np.inf)
            elif kind == "in_set":
                s = df[col].dropna()
                vals.append(float((~s.isin(param)).sum()))
        return pd.DataFrame({"i": np.arange(len(scalar), dtype=np.int64),
                             "v": np.asarray(vals, dtype=np.float64)})

    rows = []
    if scalar:
        pdf = ds.map_batches(partial, batch_format="pandas",
                             batch_size=batch_size).to_pandas()
        # O(checks × batches) scalar rows; a dataset that yields ZERO
        # partial rows (the canonical failure case — an empty table) must
        # still produce a verdict per check, so absent groups default to
        # the merge identity (empty series → 0 for the summed counts,
        # ±inf for the extremes) instead of raising KeyError
        groups = ({int(i): g for i, g in pdf.groupby("i")["v"]}
                  if len(pdf) else {})  # empty ds → columnless frame
    empty = pd.Series([], dtype=np.float64)
    for (name, kind, col, param), grp in (
            zip(scalar, (groups.get(i, empty) for i in range(len(scalar))))
            if scalar else ()):
        if kind in ("row_count_ge", "not_null", "in_set"):
            m = float(grp.sum())
        elif kind == "min_ge":
            m = float(grp.min()) if len(grp) else np.inf
        else:
            m = float(grp.max()) if len(grp) else -np.inf
        passed = {"row_count_ge": lambda: m >= param,
                  "not_null": lambda: m == 0.0,
                  "in_set": lambda: m == 0.0,
                  "min_ge": lambda: m >= param,
                  "max_le": lambda: m <= param}[kind]()
        rows.append((name, m, bool(passed)))

    for name, _, col, _ in uniq:
        cnt = pre_aggregate(ds.select_columns([col]), [col],
                            {"c": (None, "count")})

        def surplus(df: pd.DataFrame) -> pd.DataFrame:
            c = df["c"].to_numpy(np.int64)
            return pd.DataFrame({"s": [float((c[c > 1] - 1).sum())]})

        sdf = cnt.map_batches(surplus, batch_format="pandas").to_pandas()
        m = float(sdf["s"].sum()) if len(sdf) else 0.0  # empty ds → no cols
        rows.append((name, m, m == 0.0))

    order = {n: i for i, (n, *_rest) in enumerate(checks)}
    rows.sort(key=lambda r: order[r[0]])
    return pd.DataFrame({"check": [r[0] for r in rows],
                         "metric": np.asarray([r[1] for r in rows],
                                              dtype=np.float64),
                         "passed": [r[2] for r in rows]})
