"""Deterministic sampling / splitting / mixing / packing — the dataset-
assembly operators a training-data pipeline runs after dedup and quality
filtering.

All four are hash-deterministic (a pure function of the row id + a salt),
which is what makes them usable at 100 TB: assignments are stable under
re-runs, resumable shards, and corpus growth (adding rows never moves an
existing row between splits), and every operator is map-only or a single
co-shuffle — no global RNG, no driver-side pass.

The per-row randomness source is the house hash (sha256, the same one URL
identity uses — ``utils/urls.py``): the first ``HEX_DIGITS`` hex chars of
``sha256(f"{id}:{salt}")`` compared lexicographically against a threshold
string is a uniform draw in [0, 1) that DuckDB reproduces exactly
(``substr(sha256(...), 1, 12)``), so every operator here is SQL-oracle
checkable.  sha256 per row is a C-call loop, not numpy — same cost floor
the URL canonicalizer pays; it is embarrassingly parallel and map-only.

Operators (reference has no analog — the reference corpus is consumed
whole; these are the §"beyond the reference" training-pipeline set):

- ``hash_split``      train/val/test assignment, map-only, zero shuffle.
- ``stratified_sample``  k rows per group by hash order; one co-shuffle.
- ``weighted_mix``    per-source keep rates (domain mixing), map-only.
- ``pack_sequences``  concat-then-chunk packing: running size within an
  ordered partition, chunk = prev_cumsum // capacity; one co-shuffle with
  a single vectorized cumsum kernel per bucket (no per-doc Python).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from hashlib import sha256

import numpy as np
import pandas as pd
import ray
from ray.data import Dataset

from searchengine_ray.stages.relational import bucketed_apply, pre_aggregate

HEX_DIGITS = 12  # 48 bits of hash → threshold granularity 2^-48


def frac_to_hex(frac: float, digits: int = HEX_DIGITS) -> str:
    """Threshold string T such that P[hash_hex(id) < T] == frac.

    ``'g'`` (lexicographically above every hex string) encodes frac >= 1 —
    ``'f' * digits`` would wrongly drop the all-f hash value."""
    if frac >= 1.0:
        return "g"
    if frac <= 0.0:
        return ""
    return format(int(frac * 16 ** digits), f"0{digits}x")


def hash_hex(ids: Sequence, salt: str, digits: int = HEX_DIGITS) -> np.ndarray:
    """Per-id uniform draw as a ``digits``-char hex string (dtype ``<U``).
    Mirrors SQL ``substr(sha256(CAST(id AS VARCHAR) || ':salt'), 1, digits)``
    — ids render via ``str()`` so int64/string ids match VARCHAR casts."""
    out = np.empty(len(ids), dtype=f"<U{digits}")
    for i, v in enumerate(ids):
        out[i] = sha256(f"{v}:{salt}".encode()).hexdigest()[:digits]
    return out


def hash_split(
    ds: Dataset, id_col: str, salt: str,
    splits: Sequence[tuple[str, float]],
    out_col: str = "split",
) -> Dataset:
    """Assign every row to one of ``splits`` [(name, frac), ...] (fracs sum
    to 1) by its id hash.  Map-only: zero shuffle, stable under corpus
    growth and re-partitioning."""
    names = [n for n, _ in splits]
    cum, bounds = 0.0, []
    for _, f in splits[:-1]:
        cum += f
        bounds.append(frac_to_hex(cum))
    thresholds = np.array(bounds, dtype=f"<U{HEX_DIGITS}")
    names_arr = np.array(names, dtype=object)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        h = hash_hex(df[id_col].to_numpy(), salt)
        idx = np.searchsorted(thresholds, h, side="right")
        df[out_col] = names_arr[idx]
        return df

    return ds.map_batches(assign, batch_format="pandas")


def stratified_sample(
    ds: Dataset, group_col: str, id_col: str, k: int, salt: str,
) -> Dataset:
    """k rows per ``group_col`` value, drawn uniformly WITHOUT replacement
    (the k smallest id hashes per group; groups smaller than k keep every
    row).  ONE co-shuffle on the group key; inside each bucket a single
    sort + grouped head serves every group at once."""

    def add_h(df: pd.DataFrame) -> pd.DataFrame:
        df["_h"] = hash_hex(df[id_col].to_numpy(), salt)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col, "_h", id_col], kind="mergesort")
        return (g.groupby(group_col, sort=False).head(k)
                .drop(columns=["_h"]))

    return bucketed_apply(ds.map_batches(add_h, batch_format="pandas"),
                          [group_col], per_bucket)


def weighted_mix(
    ds: Dataset, id_col: str, rate_col: str, rates: Mapping[str, float],
    salt: str, default_rate: float = 0.0,
) -> Dataset:
    """Domain mixing: keep each row with probability ``rates[row[rate_col]]``
    (deterministic in the row id).  Map-only — the 100-TB shape for
    re-weighting training sources without a shuffle or a global pass."""
    thr = {k: frac_to_hex(v) for k, v in rates.items()}
    default_thr = frac_to_hex(default_rate)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        h = hash_hex(df[id_col].to_numpy(), salt)
        t = df[rate_col].map(thr).fillna(default_thr).to_numpy(dtype=object)
        return df[h < t.astype(f"<U{max(HEX_DIGITS, 1)}")]

    return ds.map_batches(keep, batch_format="pandas")


def epoch_mix(
    ds: Dataset, id_col: str, source_col: str,
    epochs: Mapping[str, float], salt: str, default_epochs: float = 1.0,
    epoch_col: str = "epoch",
) -> Dataset:
    """Multi-epoch source upsampling (the LLaMA-style data recipe: each
    source contributes a fractional number of epochs to the training mix).
    A row whose source has factor f appears floor(f) times plus one more
    with probability frac(f) — so 2.45 epochs means two guaranteed copies
    and a 45% hash-deterministic third, while 0.3 downsamples exactly like
    ``weighted_mix``.  E[copies] = f with hard integer floors, which
    Bernoulli keep-rates cannot express (they top out at one copy).

    Map-only: per batch one ``np.repeat`` explode plus a segmented arange
    for the epoch index — no shuffle, no global pass, deterministic in
    (id, salt) so re-runs and resumed shards agree.  Output rows carry
    ``epoch_col`` = 0..copies-1 so downstream ordering (e.g.
    ``global_shuffle`` keyed on (id, epoch)) can separate the copies."""
    base = {k: int(np.floor(v)) for k, v in epochs.items()}
    thr = {k: frac_to_hex(v - np.floor(v)) for k, v in epochs.items()}
    default_base = int(np.floor(default_epochs))
    default_thr = frac_to_hex(default_epochs - np.floor(default_epochs))
    u_len = max(HEX_DIGITS, 1)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        src = df[source_col]
        b = src.map(base).fillna(default_base).to_numpy(dtype=np.int64)
        t = (src.map(thr).fillna(default_thr)
             .to_numpy(dtype=object).astype(f"<U{u_len}"))
        h = hash_hex(df[id_col].to_numpy(), salt)
        reps = b + (h < t)
        out = df.iloc[np.repeat(np.arange(len(df)), reps)].copy()
        # epoch index 0..reps-1 per source row: segmented arange
        out[epoch_col] = (np.arange(int(reps.sum()), dtype=np.int64)
                          - np.repeat(np.cumsum(reps) - reps, reps))
        return out

    return ds.map_batches(explode, batch_format="pandas")


def temperature_mix(
    ds: Dataset, id_col: str, stratum_col: str, salt: str,
    max_strata: int = 100_000,
) -> Dataset:
    """Temperature-based stratum re-balancing (the multilingual sampling
    of XLM-R / mT5: sampled counts ∝ n_s^α): keep each row of stratum s
    with rate ``sqrt(min_n / n_s)`` — α fixed at 0.5, the one exponent
    whose rate is a CORRECTLY-ROUNDED IEEE double on both engine and SQL
    sides (sqrt is exactly rounded; libm ``pow`` is not), so the derived
    48-bit threshold strings match bit-for-bit and the kept SET is
    oracle-checkable with no rounding margin.  The smallest stratum keeps
    everything; a stratum k× larger keeps sqrt(1/k) of its rows, pulling
    the mix toward n_s^0.5.

    Scale shape: ONE ``pre_aggregate`` for the per-stratum counts (the
    only all-to-all; output is O(strata), raising above ``max_strata``),
    thresholds broadcast once, the corpus itself filters map-only —
    identical cost profile to :func:`weighted_mix` but with DATA-DERIVED
    rates."""
    counts = (pre_aggregate(ds, [stratum_col], {"n": (None, "count")})
              .to_pandas())  # bounded: O(strata) ≤ max_strata
    if len(counts) > max_strata:
        raise ValueError(
            f"{len(counts)} strata exceed max_strata={max_strata}; "
            "temperature thresholds must stay driver-sized")
    mn = int(counts["n"].min())
    thr = {}
    for s, n in zip(counts[stratum_col], counts["n"].astype(np.int64)):
        if int(n) == mn:
            thr[s] = "g"  # rate 1.0 — above every hex string
        else:
            rate = np.sqrt(np.float64(mn) / np.float64(n))
            thr[s] = format(int(rate * 16 ** HEX_DIGITS), f"0{HEX_DIGITS}x")
    thr_ref = ray.put(thr)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(thr_ref)  # plasma-local
        h = hash_hex(df[id_col].to_numpy(), salt)
        lim = df[stratum_col].map(t).to_numpy(dtype=object)
        return df[h < lim.astype(f"<U{HEX_DIGITS}")]

    return ds.map_batches(keep, batch_format="pandas")


def pack_sequences(
    ds: Dataset, part_col: str, order_col: str, size_col: str,
    capacity: int, out_col: str = "chunk_id",
) -> Dataset:
    """Concat-then-chunk sequence packing: within each ``part_col``
    partition ordered by ``order_col``, documents are laid end to end and
    ``out_col`` = which capacity-sized chunk the document STARTS in
    (prev_running_size // capacity) — the standard pack-and-split layout
    for LLM pretraining batches.  Partitions co-shuffle whole (like
    ``sessionize``); each bucket runs one vectorized grouped cumsum, no
    per-document Python."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([part_col, order_col], kind="mergesort")
        sizes = g[size_col].to_numpy(np.int64)
        prev = g.groupby(part_col, sort=False)[size_col].cumsum().to_numpy(
            np.int64) - sizes
        g[out_col] = prev // np.int64(capacity)
        return g

    return bucketed_apply(ds, [part_col], per_bucket)


def chunk_documents(
    ds: "Dataset", chunk_tokens: int = 32, overlap: int = 8,
    text_col: str = "text", id_col: str = "doc_id",
    batch_size: int = 1024,
) -> "Dataset":
    """Split documents into overlapping token-window chunks — the
    long-document → context-window preparation step of an LLM data
    pipeline.  MAP-ONLY (each chunk derives from one doc), so it scales
    embarrassingly; chunk boundaries are token-aligned with stride
    ``chunk_tokens - overlap`` and the last chunk keeps the tail (emitted
    iff it adds ≥ 1 new token, i.e. start < n_tokens - overlap or it is
    the only chunk).

    Output: (doc_id, chunk_id, n_tokens, chunk) with ``chunk`` the
    space-joined tokens (SQL mirror: array slices of the same token
    array).  Empty docs emit nothing."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap

    from searchengine_ray.stages.text import simple_tokens

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ids, cids, lens, chunks = [], [], [], []
        for doc_id, text in zip(df[id_col].to_numpy(), df[text_col]):
            toks = simple_tokens(text or "")
            n = len(toks)
            if not n:
                continue
            cid = 0
            for start in range(0, max(n - overlap, 1), stride):
                piece = toks[start:start + chunk_tokens]
                ids.append(doc_id)
                cids.append(cid)
                lens.append(len(piece))
                chunks.append(" ".join(piece))
                cid += 1
        return pd.DataFrame({
            "doc_id": np.array(ids, dtype=np.int64),
            "chunk_id": np.array(cids, dtype=np.int64),
            "n_tokens": np.array(lens, dtype=np.int64),
            "chunk": pd.Series(chunks, dtype=object)})

    return ds.map_batches(explode, batch_format="pandas",
                          batch_size=batch_size)
