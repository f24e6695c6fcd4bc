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
