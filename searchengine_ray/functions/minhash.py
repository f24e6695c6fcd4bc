"""MinHash signatures + LSH banding for near-duplicate detection at scale.

Public construction (Broder 1997, "On the resemblance and containment of
documents"; MMDS ch. 3): k independent permutations approximated by
``(a*x + b) mod p`` over 64-bit shingle hashes; signature similarity is an
unbiased estimator of Jaccard.  LSH: split the k-row signature into b bands
of r rows; documents sharing any band bucket become candidate pairs.

This is the scale path for the reference's O(N²) content near-dup scan
(reference ngrams.py:88-101); the exact-Jaccard verify step runs only on
LSH candidates.  Deterministic: fixed seed, no wall-clock.
"""

from __future__ import annotations

import numpy as np

_P = (1 << 61) - 1  # Mersenne prime


def make_coeffs(num_perm: int = 128, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _P, size=num_perm, dtype=np.int64)
    b = rng.randint(0, _P, size=num_perm, dtype=np.int64)
    return a, b


def minhash_signature(
    shingles: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """shingles: int64 array of shingle hashes → int64 signature[num_perm].

    Empty shingle sets get an all-``_P`` sentinel signature (never collides
    with a real minimum)."""
    if shingles.size == 0:
        return np.full(a.shape[0], _P, dtype=np.int64)
    return _affine_min(shingles, a, b)


def _affine_min(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """min over shingles of (a*x+b) mod 2^61-1 — fully vectorized over
    (num_perm × num_shingles) with exact 122-bit split multiplies and the
    Mersenne folding trick (2^64 ≡ 8 mod 2^61-1)."""
    M32 = np.uint64(0xFFFFFFFF)
    M61 = np.uint64((1 << 61) - 1)
    x = shingles.astype(np.uint64) & M61
    au = a.astype(np.uint64)
    bu = b.astype(np.uint64)
    ah, al = (au >> np.uint64(32))[:, None], (au & M32)[:, None]
    xh, xl = (x >> np.uint64(32))[None, :], (x & M32)[None, :]
    # product = ah*xh*2^64 + (ah*xl + al*xh)*2^32 + al*xl
    mid = ah * xl + al * xh
    p = al * xl
    lo = p + ((mid & M32) << np.uint64(32))
    carry = (lo < p).astype(np.uint64)  # wraparound of the 64-bit add
    hi = ah * xh + (mid >> np.uint64(32)) + carry
    v = (hi << np.uint64(3)) + (lo & M61) + (lo >> np.uint64(61)) + bu[:, None]
    v = (v & M61) + (v >> np.uint64(61))
    v = np.where(v >= np.uint64(_P), v - np.uint64(_P), v)
    return v.min(axis=1).astype(np.int64)


def _affine_matrix(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(num_perm × num_shingles) matrix of (a*x+b) mod 2^61-1 — the exact
    arithmetic of ``_affine_min`` without the final min."""
    M32 = np.uint64(0xFFFFFFFF)
    M61 = np.uint64((1 << 61) - 1)
    x = shingles.astype(np.uint64) & M61
    au = a.astype(np.uint64)
    bu = b.astype(np.uint64)
    ah, al = (au >> np.uint64(32))[:, None], (au & M32)[:, None]
    xh, xl = (x >> np.uint64(32))[None, :], (x & M32)[None, :]
    mid = ah * xl + al * xh
    p = al * xl
    lo = p + ((mid & M32) << np.uint64(32))
    carry = (lo < p).astype(np.uint64)
    hi = ah * xh + (mid >> np.uint64(32)) + carry
    v = (hi << np.uint64(3)) + (lo & M61) + (lo >> np.uint64(61)) + bu[:, None]
    v = (v & M61) + (v >> np.uint64(61))
    v = np.where(v >= np.uint64(_P), v - np.uint64(_P), v)
    return v


def batch_signatures(
    shingle_arrays: list[np.ndarray], a: np.ndarray, b: np.ndarray,
    chunk_shingles: int = 1 << 15,
) -> np.ndarray:
    """Signatures for a whole batch of docs in one vectorized pass.

    Concatenates every doc's shingles, computes the affine matrix in
    bounded chunks (≤ chunk_shingles columns ⇒ ~32 MB at 128 perms), and
    takes per-doc minima with ``np.minimum.reduceat`` — no per-doc Python
    beyond building the offsets.  Empty docs get the all-``_P`` sentinel
    (same as ``minhash_signature``)."""
    num_perm = a.shape[0]
    n_docs = len(shingle_arrays)
    sigs = np.full((n_docs, num_perm), _P, dtype=np.uint64)
    lens = np.fromiter((s.size for s in shingle_arrays), dtype=np.int64,
                       count=n_docs)
    nonempty = np.flatnonzero(lens)
    if nonempty.size == 0:
        return sigs.astype(np.int64)
    cat = np.concatenate([shingle_arrays[i] for i in nonempty])
    offsets = np.zeros(nonempty.size, dtype=np.int64)
    np.cumsum(lens[nonempty][:-1], out=offsets[1:])
    # chunk along the shingle axis, aligned to doc boundaries
    start_doc = 0
    while start_doc < nonempty.size:
        end_doc = start_doc + 1
        start_off = offsets[start_doc]
        while (end_doc < nonempty.size
               and offsets[end_doc] - start_off < chunk_shingles):
            end_doc += 1
        end_off = (offsets[end_doc] if end_doc < nonempty.size else cat.size)
        m = _affine_matrix(cat[start_off:end_off], a, b)  # (P, S_chunk)
        local_off = (offsets[start_doc:end_doc] - start_off)
        mins = np.minimum.reduceat(m, local_off, axis=1)  # (P, docs_chunk)
        sigs[nonempty[start_doc:end_doc]] = mins.T
        start_doc = end_doc
    return sigs.astype(np.int64)


def band_digests(sigs: np.ndarray, num_bands: int = 16) -> np.ndarray:
    """(n_docs, num_perm) signatures → (n_docs, num_bands) int64 FNV-1a band
    digests — vectorized across docs and bands (identical values to
    ``band_keys``; the loop is over the r rows of a band only)."""
    n_docs, num_perm = sigs.shape
    r = num_perm // num_bands
    chunks = sigs.astype(np.uint64).reshape(n_docs, num_bands, r)
    digest = np.full((n_docs, num_bands), 1469598103934665603, dtype=np.uint64)
    fnv = np.uint64(1099511628211)
    for i in range(r):
        digest = (digest ^ chunks[:, :, i]) * fnv  # uint64 wrap == & mask
    return digest.astype(np.int64)


def band_keys(sig: np.ndarray, num_bands: int = 16) -> list[tuple[int, int]]:
    """Signature → (band_id, 64-bit band digest) pairs for the LSH groupby."""
    r = sig.shape[0] // num_bands
    out = []
    for bidx in range(num_bands):
        chunk = sig[bidx * r : (bidx + 1) * r]
        digest = 1469598103934665603  # FNV-1a 64 offset
        for v in chunk.tolist():
            digest ^= v & 0xFFFFFFFFFFFFFFFF
            digest = (digest * 1099511628211) & 0xFFFFFFFFFFFFFFFF
        out.append((bidx, digest - (1 << 64) if digest >= (1 << 63) else digest))
    return out
