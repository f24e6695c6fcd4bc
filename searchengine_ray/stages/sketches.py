"""Mergeable quantile sketch — the many/hot-group scale path for exact
per-group quantiles (``q_event_value_quantiles`` holds the exact form; its
docstring names this sketch as the corpus-scale alternative).

Design: a sketch is a sorted array of (value, weight) centroids, capacity
``k``.  Build: per batch per group, sort the values and compress equal-
weight runs to ≤ k centroids (weighted means of equal-cumulative-weight
strips — a uniform-compression t-digest; Dunning & Ertl 2019 describe the
centroid-merge family, this uses the simplest deterministic strip rule).
Merge: concatenate centroid lists, re-sort, re-compress — associative and
deterministic, so partials combine map-side and only O(k) rows per group
ever shuffle.  Query: midpoint-rank linear interpolation over cumulative
weights (the same convention as ``numpy.percentile``'s ``linear`` on the
expanded multiset when every weight is 1 and len ≤ k — exact in that
regime).

Rank error is bounded by the strip width: a quantile's estimated rank is
within ~1/k of truth, independent of data size or distribution (values
inside a strip collapse to their weighted mean).  k=256 → ≤ ~0.4% rank
error; the accuracy gate in tests/test_sketches.py asserts this against
exact percentiles on skewed and adversarial inputs.

Scale shape: the fact table never shuffles — per-batch partials are O(k)
rows per (batch, group); the final merge is a ``bucketed_map_groups`` over
O(k · partials) centroid rows.  10^9 rows × 10^6 groups stays a
centroid-row shuffle, where the exact operator would co-locate every raw
value of a group.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from ray.data import Dataset


def compress(values: np.ndarray, weights: np.ndarray, k: int):
    """(sorted values, weights) → ≤ k centroids (sorted values, weights).

    Elements are assigned to k equal-cumulative-weight strips by their
    midpoint rank; each strip becomes its weighted mean.  Deterministic,
    fully vectorized."""
    if values.size <= k:
        return values, weights
    cumw = np.cumsum(weights)
    total = cumw[-1]
    # strip index by midpoint rank, clipped to [0, k)
    mid = cumw - weights / 2.0
    strip = np.minimum((mid * k / total).astype(np.int64), k - 1)
    wsum = np.bincount(strip, weights=weights, minlength=k)
    vsum = np.bincount(strip, weights=weights * values, minlength=k)
    keep = wsum > 0
    return vsum[keep] / wsum[keep], wsum[keep]


def sketch_quantiles(values: np.ndarray, weights: np.ndarray,
                     qs: Sequence[float]) -> np.ndarray:
    """Quantiles from a sorted centroid list by midpoint-rank interpolation."""
    if values.size == 0:
        return np.full(len(qs), np.nan)
    cumw = np.cumsum(weights)
    total = cumw[-1]
    mid = cumw - weights / 2.0
    targets = np.asarray(qs, dtype=np.float64) * (total - 1.0) + 0.5
    return np.interp(targets, mid, values)


def quantile_sketch_aggregate(
    ds: Dataset,
    keys: Sequence[str],
    value_col: str,
    qs: dict[str, float],
    k: int = 256,
    batch_size: int = 65536,
) -> Dataset:
    """Per-group approximate quantiles via mergeable sketches.

    ``qs``: {output_column: quantile in [0,1]}.  Returns a Dataset with
    columns [*keys, *qs] — one row per group.  The fact table reduces
    map-side to O(k) centroid rows per (batch, group); only those shuffle.

    Partitioning note: the per-batch build iterates groups in Python
    (each group's sort+compress is vectorized), which is the right shape
    while groups-per-batch ≪ rows-per-batch; if group count rivals row
    count the sketches degenerate to raw values anyway (n ≤ k ⇒ no
    compression) and exact ``bucketed_apply`` quantiles are the better
    operator.  The merge side shuffles only centroid rows, so many groups
    cost bucket tasks, not memory."""
    keys = list(keys)
    from searchengine_ray.stages.relational import bucketed_map_groups

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = {kcol: [] for kcol in keys}
        out["_sk_v"] = []
        out["_sk_w"] = []
        for gkey, sub in df.groupby(keys, sort=False):
            v = np.sort(sub[value_col].to_numpy(np.float64))
            v, w = compress(v, np.ones_like(v), k)
            if not isinstance(gkey, tuple):
                gkey = (gkey,)
            for kcol, kv in zip(keys, gkey):
                out[kcol].append(kv)
            out["_sk_v"].append(v)
            out["_sk_w"].append(w)
        return pd.DataFrame(out)

    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=batch_size)

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        v = np.concatenate([np.asarray(x, dtype=np.float64)
                            for x in g["_sk_v"]])
        w = np.concatenate([np.asarray(x, dtype=np.float64)
                            for x in g["_sk_w"]])
        order = np.argsort(v, kind="mergesort")
        v, w = compress(v[order], w[order], k)
        row = {kcol: [g[kcol].iloc[0]] for kcol in keys}
        est = sketch_quantiles(v, w, list(qs.values()))
        for col, e in zip(qs, est):
            row[col] = [e]
        return pd.DataFrame(row)

    return bucketed_map_groups(partials, keys, merge_group)


# ---------------------------------------------------------------------------
# HyperLogLog: mergeable per-group approximate distinct count
# ---------------------------------------------------------------------------
# The scale path for COUNT(DISTINCT): the exact operator
# (``q_distinct_users_by_type``'s two-stage pre_aggregate) shuffles one row
# per DISTINCT (group, key) — unbounded when keys are high-cardinality.
# Here each batch reduces to ≤ m register rows per group (m = 2^p), the
# registers max-merge through ``pre_aggregate`` (max is associative ⇒ the
# sketch is mergeable map-side), and only O(groups × m) tiny rows ever
# shuffle regardless of corpus size.  Standard error ≈ 1.04/√m
# (Flajolet et al. 2007); p=12 ⇒ m=4096 ⇒ ~1.6%.


def _hll_rho(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register, rho) for 64-bit hashes: register = low ``p`` bits, rho =
    1 + leading-zero count of a 52-bit window above them.  The window is
    capped at 52 bits so the uint→float64 conversion is EXACT and
    ``np.frexp`` returns the exact bit length — no log2 rounding hazard.
    All arithmetic runs on int64 views (this host's numpy executes uint64
    array ops 100-300× slower — see CLAUDE.md)."""
    hi = h.view(np.int64)
    m = 1 << p
    reg = hi & np.int64(m - 1)
    w = (hi >> np.int64(p)) & np.int64((1 << 52) - 1)
    _, e = np.frexp(w.astype(np.float64))  # exact bit_length for w < 2^53
    rho = (53 - e).astype(np.int64)        # w == 0 ⇒ e == 0 ⇒ rho == 53
    return reg, rho


def _hll_alpha(m: int) -> float:
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_distinct_aggregate(
    ds: Dataset,
    keys: Sequence[str],
    col: str,
    p: int = 12,
    out_col: str = "approx_distinct",
    batch_size: int = 65536,
) -> Dataset:
    """Per-group approximate COUNT(DISTINCT ``col``) via HyperLogLog.

    Returns one row per group: [*keys, out_col] with the bias-corrected
    estimate (linear counting below 2.5m — the small-range regime where
    raw HLL biases high).  Relative error ~1.04/√(2^p); the gate in
    tests/test_sketches.py asserts it against exact nunique on uniform,
    skewed and multi-group inputs.

    Memory: the per-batch scatter arena is groups_per_batch × 2^p int64
    (4096-register default = 32 KB/group) — at extreme group counts per
    batch, lower ``p`` or ``batch_size``; only HIT registers are emitted
    as rows, so the shuffle never pays for the arena's zeros."""
    keys = list(keys)
    m = 1 << p
    alpha = _hll_alpha(m)
    from searchengine_ray.stages.relational import (
        bucketed_map_groups, pre_aggregate)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        gb = df.groupby(keys, sort=False)
        gidx = gb.ngroup().to_numpy()
        first_idx = np.unique(gidx, return_index=True)[1]
        key_tbl = df[keys].iloc[first_idx].reset_index(drop=True)
        h = pd.util.hash_pandas_object(df[col], index=False,
                                       categorize=False).to_numpy(
            dtype=np.uint64)
        reg, rho = _hll_rho(h, p)
        # register-max per (group, reg) in one scatter over a flat arena
        arena = np.zeros(len(first_idx) * m, dtype=np.int64)
        np.maximum.at(arena, gidx * np.int64(m) + reg, rho)
        nz = np.nonzero(arena)[0]
        out = key_tbl.iloc[nz // m].reset_index(drop=True)
        out["reg"] = (nz % m).astype(np.int64)
        out["rho"] = arena[nz]
        return out

    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=batch_size)
    merged = pre_aggregate(partials, keys + ["reg"], {"rho": ("rho", "max")})

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        rho = g["rho"].to_numpy(np.float64)
        v0 = m - len(g)  # registers never hit
        s = np.power(2.0, -rho).sum() + v0
        est = alpha * m * m / s
        if est <= 2.5 * m and v0 > 0:
            est = m * np.log(m / v0)  # linear counting (small range)
        row = {k: [g[k].iloc[0]] for k in keys}
        row[out_col] = np.asarray([round(est)], dtype=np.int64)
        return pd.DataFrame(row)

    return bucketed_map_groups(merged, keys, finalize)


# ---------------------------------------------------------------------------
# Heavy hitters: Misra-Gries candidate sketch + exact recount (two passes)
# ---------------------------------------------------------------------------


def mg_compress(counts: pd.Series, m: int) -> pd.Series:
    """Misra-Gries compression of a (key → weight) summary to ≤ m counters.

    Subtracts the (m+1)-th largest weight from every counter and drops the
    non-positives — the classic MG step, vectorized.  Per-key undercount is
    ≤ total/(m+1): the m+1 counters at or above the pivot each hold ≥ pivot
    weight, so (m+1)·pivot ≤ total."""
    if len(counts) <= m:
        return counts
    pivot = counts.nlargest(m + 1).iloc[-1]
    out = counts - pivot
    return out[out > 0]


def heavy_hitters_exact(
    ds: Dataset, col: str, weight_col: str | None = None,
    threshold_frac: float = 0.005, batch_size: int = 65536,
) -> pd.DataFrame:
    """EXACT items with total weight > threshold_frac × grand total — the
    two-pass heavy-hitters shape that scales:

    pass 1 (candidates): each batch compresses its weighted counts to a
    Misra-Gries summary of m = ⌈2/threshold⌉ counters (undercount ≤
    batch_total/(m+1)); partial summaries SUM through ``pre_aggregate``
    (summed undercount ≤ N/(m+1) ≤ N·thr/2), and the distributed filter
    ``est > N·thr − N/(m+1)`` keeps every true heavy hitter while bounding
    the candidate set to < 2/threshold items (each survivor holds >
    N·thr/2 of the N total estimate mass) — THAT is what reaches the
    driver, never the distinct-key space.

    pass 2 (exact): broadcast-semi filter on the candidate set + one
    ``pre_aggregate`` recount, then the exact HAVING threshold.

    Returns (col, n) with exact totals, sorted (n desc, col asc).
    ``ds`` is consumed twice — pass a ``materialize()``d projection when
    upstream compute is expensive."""
    import math

    import ray

    from searchengine_ray.stages.relational import (
        broadcast_semi_filter, pre_aggregate)

    m = int(math.ceil(2.0 / threshold_frac))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if weight_col is None:
            counts = df[col].value_counts()
        else:
            counts = df.groupby(col, sort=False)[weight_col].sum()
        keep = mg_compress(counts, m)
        return pd.DataFrame({col: keep.index.to_numpy(),
                             "est": keep.to_numpy(dtype=np.float64)})

    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=batch_size)
    merged = pre_aggregate(partials, [col], {"est": ("est", "sum")})

    total = int(ds.sum(weight_col)) if weight_col is not None else ds.count()
    cut = threshold_frac * total - total / (m + 1)

    cand = merged.map_batches(
        lambda df: df[df["est"].to_numpy(dtype=np.float64) > cut][[col]],
        batch_format="pandas").to_pandas()  # < 2/threshold rows by the bound
    if not len(cand):
        return pd.DataFrame({col: pd.Series([], dtype=object),
                             "n": pd.Series([], dtype=np.int64)})

    hits = broadcast_semi_filter(ds, set(cand[col]), col)
    exact = pre_aggregate(
        hits, [col],
        {"n": ((weight_col, "sum") if weight_col else (None, "count"))}
    ).to_pandas()
    exact["n"] = exact["n"].astype(np.int64)
    out = exact[exact["n"] > threshold_frac * total]
    return (out.sort_values(["n", col], ascending=[False, True])
            .reset_index(drop=True))


def heavy_hitters_approx(
    ds: Dataset, col: str, weight_col: str | None = None,
    threshold_frac: float = 0.005, batch_size: int = 65536,
) -> pd.DataFrame:
    """ONE-pass heavy hitters: the candidate stage of
    ``heavy_hitters_exact`` without the recount — for streams / pipelines
    where the input cannot be read twice.

    Returns (col, est, est_floor) sorted (est desc, col asc).
    Guarantees (the Misra-Gries merge bound, pytest-gated):

    - COMPLETE: every item with true weight > threshold_frac × total is
      present (its merged estimate undercounts by ≤ total/(m+1) ≤
      total×thr/2, which keeps it above the filter cut);
    - BOUNDED: est ≤ true weight ≤ est + total/(m+1) — ``est_floor`` is
      the guaranteed lower bound max(est, 0) and the candidate set stays
      < 2/threshold items.

    The single data pass is the partial+merge; the grand total is
    ``count()`` (parquet-metadata cheap) or, with ``weight_col``, one
    additional aggregate pass — still never a per-key second scan."""
    import math

    from searchengine_ray.stages.relational import pre_aggregate

    m = int(math.ceil(2.0 / threshold_frac))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if weight_col is None:
            counts = df[col].value_counts()
        else:
            counts = df.groupby(col, sort=False)[weight_col].sum()
        keep = mg_compress(counts, m)
        return pd.DataFrame({col: keep.index.to_numpy(),
                             "est": keep.to_numpy(dtype=np.float64)})

    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=batch_size)
    merged = pre_aggregate(partials, [col], {"est": ("est", "sum")})

    total = int(ds.sum(weight_col)) if weight_col is not None else ds.count()
    cut = threshold_frac * total - total / (m + 1)
    cand = merged.map_batches(
        lambda df: df[df["est"].to_numpy(dtype=np.float64) > cut],
        batch_format="pandas").to_pandas()  # < 2/threshold rows by the bound
    if not len(cand):
        return pd.DataFrame({col: pd.Series([], dtype=object),
                             "est": pd.Series([], dtype=np.float64),
                             "est_floor": pd.Series([], dtype=np.float64)})
    cand["est_floor"] = cand["est"].clip(lower=0.0)
    return (cand.sort_values(["est", col], ascending=[False, True])
            .reset_index(drop=True))


# ---------------------------------------------------------------------------
# Exact GLOBAL quantile without materializing the column: iterative
# distributed histogram refinement.  Each pass streams the dataset once and
# ships the driver only O(bins) (count, min, max) rows via ``pre_aggregate``;
# the interval [lo, hi] containing the target order statistics shrinks every
# pass (4096 bins ⇒ ~count/4096 per pass), so 10^10 rows resolve in 2-3
# passes, each map-only + one tiny shuffle.  Exactness: a needed order stat
# is KNOWN the moment its bin holds a single distinct value (bin min == max),
# and when the two ranks of an interpolated quantile straddle a bin boundary
# both resolve immediately (k0 = last of its bin → bin max; k1 = first of
# the next → bin min).  The small-interval shortcut collects ≤
# ``max_driver_rows`` in-range values exactly.  Interpolation is
# numpy/DuckDB ``quantile_cont``: x[k0] + frac·(x[k1] − x[k0]).
#
# This is the exact sibling of ``quantile_sketch_aggregate``: use the sketch
# for many-group / approximate quantiles, this for a single global threshold
# that must be exact (e.g. "keep docs above the p25 quality score").
# ---------------------------------------------------------------------------


def _hist_pass(ds: Dataset, col: str, lo: float, hi: float, bins: int):
    """One refinement pass: per-bin (count, min, max) over values in
    [lo, hi], plus the count strictly below lo (bin -1).  Returns a pandas
    frame of ≤ bins+1 rows (driver-bounded O(bins))."""
    from searchengine_ray.stages.relational import pre_aggregate

    width = hi - lo

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        below = int((v < lo).sum())
        vin = v[(v >= lo) & (v <= hi)]
        idx = np.minimum(((vin - lo) * (bins / width)).astype(np.int64),
                         bins - 1)
        cnt = np.bincount(idx, minlength=bins)
        nz = np.flatnonzero(cnt)
        order = np.argsort(idx, kind="stable")
        vs, si = vin[order], idx[order]
        starts = np.searchsorted(si, nz, side="left")
        ends = np.searchsorted(si, nz, side="right")
        vmin = np.minimum.reduceat(vs, starts) if nz.size else np.array([])
        vmax = np.maximum.reduceat(vs, starts) if nz.size else np.array([])
        del ends
        out = pd.DataFrame({"bin": nz.astype(np.int64),
                            "cnt": cnt[nz].astype(np.int64),
                            "vmin": vmin, "vmax": vmax})
        if below:
            out = pd.concat([out, pd.DataFrame(
                {"bin": [-1], "cnt": [below],
                 "vmin": [np.inf], "vmax": [-np.inf]})], ignore_index=True)
        return out

    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=65536)
    merged = pre_aggregate(partials, ["bin"],
                           {"cnt": ("cnt", "sum"), "vmin": ("vmin", "min"),
                            "vmax": ("vmax", "max")})
    return merged.to_pandas().sort_values("bin").reset_index(drop=True)


def exact_global_quantile(
    ds: Dataset, col: str, q: float, bins: int = 4096,
    max_driver_rows: int = 65536, max_passes: int = 64,
) -> float:
    """Exact linear-interpolated global quantile (``quantile_cont`` / numpy
    ``linear``) of a numeric column, NULLs ignored, computed in O(log)
    streaming passes with O(bins) driver state per pass."""
    from searchengine_ray.stages.relational import pre_aggregate

    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")

    def stats_partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        if not v.size:
            return pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                                 "n": pd.Series([], dtype=np.int64),
                                 "vmin": pd.Series([], dtype=np.float64),
                                 "vmax": pd.Series([], dtype=np.float64)})
        return pd.DataFrame({"k": [0], "n": [v.size],
                             "vmin": [v.min()], "vmax": [v.max()]})

    st = pre_aggregate(
        ds.map_batches(stats_partial, batch_format="pandas",
                       batch_size=65536),
        ["k"], {"n": ("n", "sum"), "vmin": ("vmin", "min"),
                "vmax": ("vmax", "max")}).to_pandas()
    if not len(st) or int(st["n"].iloc[0]) == 0:
        return float("nan")
    n = int(st["n"].iloc[0])
    lo, hi = float(st["vmin"].iloc[0]), float(st["vmax"].iloc[0])

    h = (n - 1) * q
    k0 = int(np.floor(h))
    k1 = int(np.ceil(h))
    frac = h - k0

    def collect_range(a: float, b: float) -> np.ndarray:
        def sel(df: pd.DataFrame) -> pd.DataFrame:
            v = df[col].to_numpy(dtype=np.float64)
            v = v[~np.isnan(v)]
            return pd.DataFrame({col: v[(v >= a) & (v <= b)]})
        # bounded: caller checked the in-range count <= max_driver_rows
        return np.sort(ds.map_batches(
            sel, batch_format="pandas").to_pandas()[col].to_numpy())

    offset = 0          # values strictly below lo
    in_range = n
    x0 = x1 = None
    for _ in range(max_passes):
        if lo == hi:
            x0 = x1 = lo
            break
        if in_range <= max_driver_rows:
            vals = collect_range(lo, hi)
            x0 = float(vals[k0 - offset])
            x1 = float(vals[k1 - offset])
            break
        hist = _hist_pass(ds, col, lo, hi, bins)
        body = hist[hist["bin"] >= 0]
        cnts = body["cnt"].to_numpy(np.int64)
        cum = offset + np.cumsum(cnts)
        b0 = int(np.searchsorted(cum, k0 + 1))
        b1 = int(np.searchsorted(cum, k1 + 1))
        r0, r1 = body.iloc[b0], body.iloc[b1]
        if b0 != b1:
            # k0 is the LAST value of bin b0, k1 the FIRST of bin b1 —
            # both order stats are the bins' exact extrema
            x0, x1 = float(r0["vmax"]), float(r1["vmin"])
            break
        if r0["vmin"] == r0["vmax"]:
            x0 = x1 = float(r0["vmin"])
            break
        offset = int(cum[b0]) - int(cnts[b0])
        lo, hi = float(r0["vmin"]), float(r0["vmax"])
        in_range = int(cnts[b0])
    if x0 is None:  # max_passes exhausted (can't happen: interval shrinks)
        vals = collect_range(lo, hi)
        x0 = float(vals[k0 - offset])
        x1 = float(vals[k1 - offset])
    return x0 + frac * (x1 - x0)


# --- Count-Min sketch (Cormode & Muthukrishnan 2005) -------------------------
#
# The mergeable frequency-estimate sibling of the HLL distinct sketch and
# the Misra-Gries heavy-hitter stage: a d×w integer counter array whose
# per-batch partials merge by ELEMENTWISE SUM (exactly, in any order — the
# sketch build is bit-deterministic under repartitioning, unlike float
# moment sums), answering point frequency queries with the one-sided
# guarantee est ≥ true always and est ≤ true + N·e/w with probability
# 1 − e^−d.  The scale role: per-key frequency estimates when the key
# cardinality is unbounded (the exact pre_aggregate's output would not
# fit anywhere) but only POINT lookups are needed downstream.


def _cm_rows(values: pd.Series, depth: int, width: int) -> np.ndarray:
    """(depth, n) counter indices via double hashing on int64 views (the
    ``state/bloom._hash_pair`` discipline — uint64 array arithmetic is
    100-300× slower on this host's numpy)."""
    from searchengine_ray.state.bloom import _hash_pair

    h1, h2 = _hash_pair(values)
    mask = np.int64((1 << 63) - 1)
    out = np.empty((depth, len(values)), dtype=np.int64)
    for i in range(depth):
        out[i] = ((h1 + np.int64(i) * h2) & mask) % np.int64(width)
    return out


def count_min_build(
    ds: Dataset, col: str, depth: int = 4, width: int = 2048,
    weight_col: str | None = None, batch_size: int | None = None,
) -> np.ndarray:
    """Build the d×w sketch over a column in ONE corpus pass: each batch
    scatters into a local arena and emits only its NONZERO counters as
    (r, idx, c) rows; one ``pre_aggregate`` sums them and the driver
    assembles the ≤ d×w final table — nothing value-cardinality-scaled
    anywhere.  ``weight_col`` counts weighted occurrences (None = 1).
    Partials are float64 (exact for integer weights below 2^53, so the
    unweighted / integer-weight sketch is int64 and bit-deterministic
    under repartitioning); fractional weights return a float64 sketch
    whose one-sided est ≥ true guarantee still holds exactly.

    Batch sizing is the cost lever: a high-cardinality batch emits up to
    d×w partial rows, so batches must be LARGE relative to the sketch
    area or emission dominates the scan (measured: 20M rows into a
    4×65536 sketch took 33 s at 65k-row batches — 80M partial rows —
    vs 6 s at 1M-row batches).  Default: ≥ 4× the d×w area, floor 64k."""
    if batch_size is None:
        batch_size = max(65536, 4 * depth * width)
    from searchengine_ray.stages.relational import pre_aggregate

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"r": pd.Series([], dtype=np.int64),
                                 "idx": pd.Series([], dtype=np.int64),
                                 "c": pd.Series([], dtype=np.float64)})
        idx = _cm_rows(df[col], depth, width)
        w = (df[weight_col].to_numpy(np.float64) if weight_col else None)
        # Partials stay float64 all the way to the driver: truncating each
        # batch's bincount to int64 here would make a fractional-weight
        # sketch UNDERCOUNT (breaking the one-sided est >= true guarantee)
        # and depend on batch boundaries (breaking bit-determinism under
        # repartitioning).  Integer weights are exact in float64 below 2^53
        # so that path is unchanged bit-for-bit.
        arena = np.empty(depth * width, dtype=np.float64)
        for i in range(depth):
            # bincount beats np.add.at ~10× (buffered C loop vs unbuffered
            # scatter); float64 weight accumulation is exact below 2^53
            arena[i * width:(i + 1) * width] = np.bincount(
                idx[i], weights=w, minlength=width)
        nz = np.nonzero(arena)[0]
        return pd.DataFrame({"r": nz // width, "idx": nz % width,
                             "c": arena[nz]})

    agg = pre_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=batch_size),
        ["r", "idx"], {"c": ("c", "sum")}).to_pandas()
    vals = agg["c"].to_numpy(np.float64)
    # One dtype decision, once, on the driver: integral totals (the common
    # unweighted / integer-weight case) come back as an int64 sketch,
    # bit-identical to the pre-fix behavior; genuinely fractional weights
    # yield a float64 sketch (deterministic up to float-sum association,
    # which fractional weights imply regardless of sketch dtype).
    integral = bool(np.all(vals == np.rint(vals)))
    sk = np.zeros((depth, width),
                  dtype=np.int64 if integral else np.float64)
    sk[agg["r"].to_numpy(np.int64), agg["idx"].to_numpy(np.int64)] = (
        vals.astype(np.int64) if integral else vals)
    return sk


def count_min_query(sketch: np.ndarray, values: pd.Series) -> np.ndarray:
    """Vectorized point estimates: min over the depth counters each value
    hashes to.  One-sided — never under the true count."""
    depth, width = sketch.shape
    idx = _cm_rows(values, depth, width)
    est = sketch[0, idx[0]]
    for i in range(1, depth):
        np.minimum(est, sketch[i, idx[i]], out=est)
    return est
