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


# Per-process reusable (chunk × 64) float64 workspace: the bit/contrib
# matrix for 100k+ features is ~60 MB of fresh temporaries per batch, and
# first-touch page faults on some hosts run at ~8 MB/s (see
# functions/minhash.py) — the workspace bounds that to one warm-up per
# worker process and saves allocator traffic everywhere.
_WORK: dict = {}


def _get_work(width: int) -> np.ndarray:
    w = _WORK.get("f64")
    if w is None or w.shape[0] < width:
        w = np.empty((width, 64), np.float64)
        _WORK["f64"] = w
    return w


def batch_simhash(hash_arrays: list[np.ndarray],
                  weight_arrays: list[np.ndarray],
                  chunk_features: int = 1 << 14) -> np.ndarray:
    """Simhashes for a whole batch of docs in one vectorized pass — same
    values as per-doc ``simhash64_from_hashes``: concatenate every doc's
    feature hashes, unpack to a (features × 64) ±1 bit matrix (doc-aligned
    chunks written into the reusable workspace), weighted per-doc sums via
    ``np.add.reduceat``, sign → bits → int64."""
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
    # doc-aligned chunks can overshoot by the last doc's feature count
    work = _get_work(chunk_features + int(lens.max()))
    start_doc = 0
    while start_doc < nonempty.size:
        end_doc = start_doc + 1
        start_off = offsets[start_doc]
        while (end_doc < nonempty.size
               and offsets[end_doc] - start_off < chunk_features):
            end_doc += 1
        end_off = (offsets[end_doc] if end_doc < nonempty.size
                   else cat_h.size)
        L = end_off - start_off
        # little-endian byte view + bitorder="little" ⇒ column j == bit j
        bits_u8 = np.unpackbits(
            cat_h[start_off:end_off].astype("<i8").view(np.uint8)
            .reshape(-1, 8), axis=1, bitorder="little")
        B = work[:L]
        B[:] = bits_u8          # uint8 → float64 into the workspace
        B *= 2.0
        B -= 1.0
        B *= cat_w[start_off:end_off, None]
        local_off = offsets[start_doc:end_doc] - start_off
        acc = np.add.reduceat(B, local_off, axis=0)      # (docs, 64)
        packed = np.packbits((acc > 0), axis=1, bitorder="little")
        out[nonempty[start_doc:end_doc]] = packed.view("<i8").ravel()
        start_doc = end_doc
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
