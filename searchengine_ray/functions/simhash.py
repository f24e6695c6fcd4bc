"""SimHash (Charikar 2002) document fingerprints.

64-bit simhash over token (or shingle) hashes: each feature's stable 64-bit
hash votes ±1 per bit position; the sign of the total per position forms the
fingerprint.  Near-duplicates = Hamming distance ≤ t; candidate generation
uses the same pigeonhole banding as phash (t+1 bands ⇒ exact recall).
"""

from __future__ import annotations

import numpy as np

from searchengine_ray.functions.ngrams import stable_hash64


def simhash64_from_hashes(hashes: np.ndarray, weights: np.ndarray | None = None) -> int:
    """int64 feature hashes (+ optional weights) → signed 64-bit simhash."""
    if hashes.size == 0:
        return 0
    u = hashes.astype(np.uint64)
    if weights is None:
        weights = np.ones(u.shape[0], dtype=np.float64)
    acc = np.zeros(64, dtype=np.float64)
    for shift in range(64):
        bits = ((u >> np.uint64(shift)) & np.uint64(1)).astype(np.float64)
        acc[shift] = np.sum(weights * (2.0 * bits - 1.0))
    v = 0
    for shift in range(64):
        if acc[shift] > 0:
            v |= 1 << shift
    return v - (1 << 64) if v >= (1 << 63) else v


def batch_simhash(hash_arrays: list[np.ndarray],
                  weight_arrays: list[np.ndarray]) -> np.ndarray:
    """Simhashes for a whole batch of docs in one vectorized pass — same
    values as per-doc ``simhash64_from_hashes``: concatenate every doc's
    feature hashes, unpack to a (features × 64) ±1 bit matrix, weighted
    per-doc sums via ``np.add.reduceat``, sign → bits → int64."""
    n_docs = len(hash_arrays)
    out = np.zeros(n_docs, dtype=np.int64)
    lens = np.fromiter((h.size for h in hash_arrays), dtype=np.int64,
                       count=n_docs)
    nonempty = np.flatnonzero(lens)
    if nonempty.size == 0:
        return out
    cat_h = np.concatenate([hash_arrays[i] for i in nonempty])
    cat_w = np.concatenate([weight_arrays[i] for i in nonempty])
    offsets = np.zeros(nonempty.size, dtype=np.int64)
    np.cumsum(lens[nonempty][:-1], out=offsets[1:])
    # little-endian byte view + bitorder="little" ⇒ column j == bit j
    bits = np.unpackbits(
        cat_h.astype("<i8").view(np.uint8).reshape(-1, 8),
        axis=1, bitorder="little").astype(np.float64)
    contrib = (2.0 * bits - 1.0) * cat_w[:, None]
    acc = np.add.reduceat(contrib, offsets, axis=0)  # (docs, 64)
    packed = np.packbits((acc > 0), axis=1, bitorder="little")
    out[nonempty] = packed.view("<i8").ravel()
    return out


def simhash64(tokens: list[str]) -> int:
    """Tokens → simhash via stable per-token hashes with count weights."""
    if not tokens:
        return 0
    uniq: dict[str, int] = {}
    for t in tokens:
        uniq[t] = uniq.get(t, 0) + 1
    hs = np.array([stable_hash64(t) for t in uniq], dtype=np.int64)
    ws = np.array(list(uniq.values()), dtype=np.float64)
    return simhash64_from_hashes(hs, ws)
