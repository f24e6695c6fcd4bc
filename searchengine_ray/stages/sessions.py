"""Event-stream windowed operators (streaming-shaped semantics over a
partitioned log — see ray_guide 'Streaming-shaped workloads').

Ordering assumption: events for one key fit in one ``map_groups`` group and
are sorted by ``ts`` inside it; cross-key ordering is irrelevant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset


def sessionize_counts(
    ds: Dataset, gap_minutes: int = 30,
    key_col: str = "user_id", ts_col: str = "ts",
) -> Dataset:
    """Session count per key with a fixed inactivity gap: a new session
    starts when the time since the previous event exceeds the gap."""
    gap = np.timedelta64(gap_minutes * 60, "s")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g[ts_col].to_numpy())
        if len(ts) == 0:
            n = 0
        else:
            n = 1 + int((np.diff(ts) > gap).sum())
        return pd.DataFrame({key_col: [g[key_col].iloc[0]], "n_sessions": [n]})

    return ds.groupby(key_col).map_groups(per_user, batch_format="pandas")


def tumbling_window_agg(
    ds: Dataset, freq: str = "D",
    key_col: str = "user_id", ts_col: str = "ts", value_col: str = "value",
) -> Dataset:
    """Per-key tumbling-window count/sum; window label as 'YYYY-MM-DD' string
    (string on both engine and oracle side avoids date-vs-timestamp type
    skew in the comparison)."""

    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        day = pd.to_datetime(df[ts_col]).dt.floor(freq).dt.strftime("%Y-%m-%d")
        out = df.assign(day=day).groupby([key_col, "day"], as_index=False).agg(
            n_events=(value_col, "size"), sum_value=(value_col, "sum")
        )
        return out

    from searchengine_ray.stages.relational import pre_aggregate

    partial = ds.map_batches(per_batch, batch_format="pandas")
    # partials already carry partial n/sum per (key, day); merge with sums
    return pre_aggregate(
        partial, [key_col, "day"],
        {"n_events": ("n_events", "sum"), "sum_value": ("sum_value", "sum")},
    )
