"""Vectorized LEB128 varint codec for delta-encoded posting lists.

The reference's index is a plain Python dict pickled to disk (idxer.py —
no posting compression at all); real web-scale indexes store doc-id GAPS
varint-packed (Witten/Moffat/Bell "Managing Gigabytes" §3; Lucene's
VInt).  These kernels are the batch-vectorized form: every numpy op runs
over ALL values in a bucket at once — per-byte-position passes (≤9, the
max varint width for a 63-bit value), never a per-value Python loop.

Encoding: little-endian base-128 groups, high bit = continuation
(identical to protobuf/Lucene VInt).  A value's width is
``ceil(bitlen/7)`` bytes, so the SQL oracle can mirror byte counts with a
CASE ladder on 128^k thresholds.
"""

from __future__ import annotations

import numpy as np

_MAX_BYTES = 9  # ceil(63/7) — covers every non-negative int64


def varint_lengths(values: np.ndarray) -> np.ndarray:
    """Per-value encoded byte count (int64).  values: non-negative int64."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    if v.size and v.min() < 0:
        raise ValueError("varint values must be non-negative")
    nb = np.ones(v.size, dtype=np.int64)
    for k in range(1, _MAX_BYTES):
        nb += v >= (np.int64(1) << np.int64(7 * k))
    return nb


def encode_stream(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode a flat value array into one uint8 stream.

    Returns ``(buf, lengths)`` — ``lengths[i]`` is the byte width of
    ``values[i]``, so callers slice per-segment blobs via
    ``np.add.reduceat(lengths, seg_starts)`` without re-encoding.
    """
    v = np.ascontiguousarray(values, dtype=np.int64)
    nb = varint_lengths(v)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), nb
    out = np.zeros(int(nb.sum()), dtype=np.uint8)
    offs = np.cumsum(nb) - nb
    for j in range(_MAX_BYTES):
        mask = nb > j
        if not mask.any():
            break
        byte = ((v[mask] >> np.int64(7 * j)) & np.int64(0x7F)).astype(np.uint8)
        cont = (nb[mask] - 1 > j).astype(np.uint8) << np.uint8(7)
        out[offs[mask] + j] = byte | cont
    return out, nb


def decode_stream(buf: np.ndarray) -> np.ndarray:
    """Decode a uint8 varint stream back to its int64 value array.

    Vectorized: terminator bytes (high bit clear) delimit values; each
    byte's contribution ``(b & 0x7f) << 7*pos`` is summed per value with
    one ``np.add.reduceat``.  Raises on a truncated stream (last byte
    still carries the continuation bit) or an over-long value.
    """
    b = np.ascontiguousarray(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.int64)
    term = (b & 0x80) == 0
    if not term[-1]:
        raise ValueError("truncated varint stream")
    ends = np.flatnonzero(term)
    counts = np.diff(np.concatenate((np.array([-1], dtype=np.int64), ends)))
    if counts.max() > _MAX_BYTES:
        raise ValueError("varint value exceeds 9 bytes (63 bits)")
    starts = ends - counts + 1
    pos = np.arange(b.size, dtype=np.int64) - np.repeat(starts, counts)
    contrib = (b & np.uint8(0x7F)).astype(np.int64) << (np.int64(7) * pos)
    return np.add.reduceat(contrib, starts)


def delta_encode(sorted_vals: np.ndarray, seg_starts: np.ndarray) -> np.ndarray:
    """First-difference within each segment; segment heads keep their
    absolute value.  ``sorted_vals`` must ascend within every segment
    (gaps stay non-negative — enforced at encode time)."""
    v = np.ascontiguousarray(sorted_vals, dtype=np.int64)
    gaps = v.copy()
    gaps[1:] -= v[:-1]
    gaps[seg_starts] = v[seg_starts]
    return gaps


def segmented_cumsum(gaps: np.ndarray, seg_starts: np.ndarray,
                     seg_counts: np.ndarray) -> np.ndarray:
    """Inverse of :func:`delta_encode`: per-segment running sum."""
    g = np.ascontiguousarray(gaps, dtype=np.int64)
    if g.size == 0:
        return g
    cs = np.cumsum(g)
    base = cs[seg_starts] - g[seg_starts]
    return cs - np.repeat(base, seg_counts)
