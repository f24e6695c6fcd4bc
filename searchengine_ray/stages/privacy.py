"""Privacy operators over quasi-identifier groups.

``k_anonymity_suppress``: drop every row whose quasi-identifier
combination is shared by fewer than k rows — the suppression step of
k-anonymization (Sweeney 2002), and the privacy counterpart of
``redact_entities`` (which scrubs direct identifiers IN the text; this
guards the joinable attribute combinations AROUND it).

Scale shape: ONE ``pre_aggregate`` over the quasi-identifier columns is
the only corpus-scaled exchange (O(groups) rows out).  The qualifying
set is size-routed like the CDC upsert: up to ``broadcast_limit`` groups
it broadcasts via ``ray.put`` and the corpus filters MAP-ONLY (hash-set
membership per batch); above the limit the corpus co-shuffles once on
the group key and filters per bucket — never a driver-side group table
beyond the stated bound.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
import ray
from ray.data import Dataset

from searchengine_ray.stages.relational import (
    hash_semi_anti_join, pre_aggregate)


def _key_frame(df: pd.DataFrame, cols: list[str]) -> pd.Series:
    """Composite group key as a single string series.  Components are
    netstring-encoded (length-prefixed) so no value content can collide
    with the separator — ("a\\x1fb", "c") and ("a", "b\\x1fc") stay
    distinct (pinned by test).  NUL bytes inside quasi-identifier values
    are OUT OF CONTRACT: this stack's Arrow→pandas string conversion
    itself merges NUL-differentiated values (measured — the stop-at-NUL
    cousin of the hash_pandas_object gotcha in CLAUDE.md), upstream of
    any operator code."""
    parts = []
    for c in cols:
        s = df[c].astype(str)
        parts.append(s.str.len().astype(str) + ":" + s)
    out = parts[0]
    for p in parts[1:]:
        out = out + "\x1f" + p
    return out


def k_anonymity_suppress(
    ds: Dataset, quasi_cols: Sequence[str], k: int,
    broadcast_limit: int = 5_000_000,
) -> Dataset:
    """Rows whose ``quasi_cols`` combination occurs ≥ k times in the
    corpus; all other rows are suppressed (dropped)."""
    cols = list(quasi_cols)
    counts = pre_aggregate(ds, cols, {"n": (cols[0], "count")})

    def qualify(df: pd.DataFrame) -> pd.DataFrame:
        if "n" not in df.columns:  # schemaless empty block
            return pd.DataFrame({c: pd.Series([], dtype=object)
                                 for c in cols})
        return df[df["n"] >= k][cols]

    # the qualifying-group table is O(distinct groups); size-route it
    n_groups = counts.count()
    if n_groups <= broadcast_limit:
        keep_df = counts.map_batches(
            qualify, batch_format="pandas"
        ).to_pandas()  # bounded by broadcast_limit — the route condition
        keep_set = (set(_key_frame(keep_df, cols).to_numpy())
                    if len(keep_df) else set())  # all-empty loses schema
        keep_ref = ray.put(keep_set)

        def filt(df: pd.DataFrame) -> pd.DataFrame:
            keep = ray.get(keep_ref)  # plasma-local, zero-copy
            return df[_key_frame(df, cols).isin(keep).to_numpy()]

        return ds.map_batches(filt, batch_format="pandas")

    # giant-group-space route: one co-shuffle of corpus ∪ qualifying keys
    # on a composite key column (hash_semi_anti_join is single-key)
    def with_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_qk"] = (_key_frame(df, cols) if len(df)
                     else pd.Series([], dtype=object))
        return df

    qualifying = counts.map_batches(
        lambda df: with_key(qualify(df))[["_qk"]], batch_format="pandas")
    kept = hash_semi_anti_join(
        ds.map_batches(with_key, batch_format="pandas"), qualifying, "_qk")
    return kept.map_batches(
        lambda df: (df.drop(columns=["_qk"]) if "_qk" in df.columns
                    else df),
        batch_format="pandas")


def laplace_noisy_counts(
    ds: Dataset, key: str, salt: str, scale: float = 1.0,
    round_to: int = 6,
) -> pd.DataFrame:
    """ε-differentially-private style noisy group counts — the Laplace
    mechanism (Dwork et al. 2006) for the COUNT query: each group's
    released value is count + Laplace(scale), scale = sensitivity/ε = 1/ε
    for counting.  Only the noisy value is emitted.

    The noise is DETERMINISTIC — the inverse-CDF Laplace transform of a
    uniform derived from sha256(key‖salt) (the house hash discipline of
    ``hash_split`` / ``weighted_sample``) — so runs are reproducible and
    a SQL oracle can recompute the identical release.  A production DP
    deployment must draw fresh secret randomness per release (a
    deterministic per-key draw reveals the noise across releases); the
    mechanism's arithmetic, group reduction, and release shape here are
    the real operator, the seeding is the sandbox stand-in, exactly like
    the embedding model in ``stages/embed``.

    Scale: ONE ``pre_aggregate`` (O(groups) driver rows), noise O(groups)
    driver arithmetic.  u = (hex48 + 0.5)/2^48 ∈ (0,1) keeps the ln
    finite; engine and SQL compute the same doubles, round-6 absorbs
    libm ulps."""
    import hashlib

    agg = (pre_aggregate(ds.select_columns([key]), [key],
                         {"n": (None, "count")})
           .to_pandas().sort_values(key).reset_index(drop=True))
    ks = agg[key].astype(str)
    h48 = np.fromiter(
        (int(hashlib.sha256(f"{k}:{salt}".encode()).hexdigest()[:12], 16)
         for k in ks), dtype=np.int64, count=len(ks))
    u = (h48 + 0.5) / float(1 << 48)
    noise = np.where(u < 0.5, scale * np.log(2.0 * u),
                     -scale * np.log(2.0 * (1.0 - u)))
    return pd.DataFrame({
        key: agg[key],
        "noisy_n": np.round(agg["n"].to_numpy(np.float64) + noise,
                            round_to)})
