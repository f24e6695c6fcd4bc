"""Time-series timestamp compression: per-key delta-of-delta varint blobs.

The Gorilla/Prometheus TSDB layout (Pelkonen et al. 2015 §4.1) applied
to the event log: a key's sorted timestamps compress as
``varint(n) · varint(ts_0) · zigzag-varint(ΔΔ_1..n-1)`` — near-regular
series (heartbeats, polling, metronomic sensors) collapse to ~1 byte per
point because the second difference is ~0, and irregular series degrade
gracefully to plain deltas.  The sibling of ``stages/postings_codec``
(doc-id gaps) with the sign problem solved by zigzag: second differences
are signed, so values map ``v → (v << 1) ^ (v >> 63)`` into the
non-negative LEB128 domain.

Scale shape (the postings_codec discipline exactly): encode is ONE key
co-shuffle (``bucketed_apply``) whose kernel runs the vectorized
byte-plane ``encode_stream`` over the whole bucket at once and slices
per-key blobs with one ``reduceat`` — no per-key Python in the byte
loop; decode is MAP-ONLY — a batch's blobs concatenate into one
``decode_stream`` call and reconstruct with two ``segmented_cumsum``
passes (ΔΔ → Δ → ts).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset

from searchengine_ray.functions.varint import (
    decode_stream, encode_stream, segmented_cumsum)


def zigzag(v: np.ndarray) -> np.ndarray:
    """Signed → non-negative int64 (LSB = sign), bijective for
    |v| ≤ 2^62 − 1 — far beyond any ΔΔ of μs timestamps (2^62 μs ≈
    146k years).  Values outside wrap negative and fail LOUDLY at
    ``encode_stream``'s non-negativity check."""
    v = np.ascontiguousarray(v, dtype=np.int64)
    return (v << np.int64(1)) ^ (v >> np.int64(63))


def unzigzag(z: np.ndarray) -> np.ndarray:
    z = np.ascontiguousarray(z, dtype=np.int64)
    # logical right shift on int64 (mask the propagated sign bit) — the
    # uint64 view would be correct too but uint64 array ops are 100-300×
    # slower on this host's numpy (CLAUDE.md)
    lsr = (z >> np.int64(1)) & np.int64((1 << 63) - 1)
    return lsr ^ -(z & np.int64(1))


def encode_ts_blocks(ds: Dataset, key_col: str = "user_id",
                     ts_col: str = "ts_us") -> Dataset:
    """(key, n, blob): every key's full sorted timestamp set as one
    delta-of-delta varint blob.  Keys co-shuffle whole; per bucket ONE
    vectorized encode serves every key.  A key whose series should not
    be one row (unbounded growth) belongs in (key, time-block) pages —
    the postings_codec block-restart layout; this operator is the
    per-key-bounded form (retention-bounded telemetry)."""
    from searchengine_ray.stages.relational import bucketed_apply

    def encode_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"key": pd.Series([], dtype=np.int64),
                                 "n": pd.Series([], dtype=np.int64),
                                 "blob": pd.Series([], dtype=object)})
        g = g.sort_values([key_col, ts_col], kind="mergesort")
        k = g[key_col].to_numpy(np.int64)
        ts = g[ts_col].to_numpy(np.int64)
        keys, starts, counts = np.unique(k, return_index=True,
                                         return_counts=True)
        # per-key value layout: [n, ts_0, zz(ΔΔ_1..n-1)] — n+1 values
        m = len(ts)
        deltas = np.empty(m, dtype=np.int64)
        deltas[1:] = ts[1:] - ts[:-1]
        deltas[starts] = 0
        dod = np.empty(m, dtype=np.int64)
        dod[1:] = deltas[1:] - deltas[:-1]
        dod[starts] = 0
        # assemble the flat value stream: for each key insert (n, ts0)
        # before its n-1 dod values
        nvals = counts + 1
        vstarts = np.cumsum(nvals) - nvals
        total = int(nvals.sum())
        vals = np.empty(total, dtype=np.int64)
        vals[vstarts] = counts
        vals[vstarts + 1] = ts[starts]
        # positions for dod values: per key, slots vstarts+2 .. vstarts+n
        body_idx = (np.arange(m, dtype=np.int64)
                    - np.repeat(starts, counts)          # 0..n-1 within key
                    + np.repeat(vstarts + 1, counts))    # → vstarts+1..+n
        keep = np.ones(m, dtype=bool)
        keep[starts] = False                             # drop the 0-slot
        vals[body_idx[keep]] = zigzag(dod[keep])
        buf, lens = encode_stream(vals)
        bytes_per_key = np.add.reduceat(lens, vstarts)
        bstarts = np.cumsum(bytes_per_key) - bytes_per_key
        raw = buf.tobytes()
        blobs = [raw[int(s):int(s + c)]
                 for s, c in zip(bstarts, bytes_per_key)]
        return pd.DataFrame({"key": keys,
                             "n": counts.astype(np.int64),
                             "blob": blobs})

    return bucketed_apply(ds.select_columns([key_col, ts_col]),
                          [key_col], encode_bucket)


def decode_ts_blocks(blocks: Dataset) -> Dataset:
    """(key, ts_us) exploded back from the blobs — map-only; one
    ``decode_stream`` + two ``segmented_cumsum`` passes per batch."""

    def decode_batch(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"key": pd.Series([], dtype=np.int64),
                                 "ts_us": pd.Series([], dtype=np.int64)})
        blobs = df["blob"].tolist()
        buf = np.frombuffer(b"".join(blobs), dtype=np.uint8)
        vals = decode_stream(buf)
        nvals = df["n"].to_numpy(np.int64) + 1
        if len(vals) != int(nvals.sum()):
            raise ValueError(
                f"ts blob stream mismatch: decoded {len(vals)} values, "
                f"headers promise {int(nvals.sum())}")
        vstarts = np.cumsum(nvals) - nvals
        n = vals[vstarts]
        if not (n == df["n"].to_numpy(np.int64)).all():
            raise ValueError("ts blob header mismatch")
        ts0 = vals[vstarts + 1]
        counts = n.astype(np.int64)
        m = int(counts.sum())
        # rebuild per-key [0, dod_1..n-1] then ΔΔ → Δ → ts
        starts = np.cumsum(counts) - counts
        dod = np.empty(m, dtype=np.int64)
        body_idx = (np.arange(m, dtype=np.int64)
                    - np.repeat(starts, counts)
                    + np.repeat(vstarts + 1, counts))
        head = np.zeros(m, dtype=bool)
        head[starts] = True
        dod[~head] = unzigzag(vals[body_idx[~head]])
        dod[starts] = 0
        deltas = segmented_cumsum(dod, starts, counts)
        offs = segmented_cumsum(deltas, starts, counts)
        ts = np.repeat(ts0, counts) + offs
        return pd.DataFrame({"key": np.repeat(df["key"].to_numpy(np.int64),
                                              counts),
                             "ts_us": ts})

    return blocks.map_batches(decode_batch, batch_format="pandas")
