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
    (num_perm × num_shingles); see ``_affine_into``."""
    return _affine_matrix(shingles, a, b).min(axis=1).astype(np.int64)


def _affine_matrix(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(num_perm × num_shingles) int64 matrix of (a*x+b) mod 2^61-1 with
    freshly allocated buffers (tests / one-off use; the batch path reuses a
    per-process workspace — see ``batch_signatures``)."""
    P, S = a.shape[0], shingles.size
    work = tuple(np.empty((P, S), np.int64) for _ in range(3)) + (
        np.empty((P, S), np.bool_),)
    return _affine_into(shingles, a, b, work).copy()


# Per-process reusable workspaces keyed by (num_perm, width): the affine
# kernel's (P, S)-shaped intermediates are written into these instead of
# fresh temporaries.  Two reasons: (1) steady-state allocator/memory-bandwidth
# savings everywhere; (2) on this sandbox VM, first-touch page faults run at
# ~8 MB/s (measured: 2.1s to first-write an 18 MB array, 0.002s to rewrite),
# so a kernel that allocates ~10 fresh 32 MB temporaries per chunk pays
# 20-40s of fault time in EVERY new worker process — the workspace bounds
# that to one ~25 MB warm-up.
_WORK: dict = {}


def _get_work(num_perm: int, width: int):
    """One workspace per num_perm, grown (never shrunk) to ``width`` —
    varying batch shapes reuse the same buffers instead of keying new
    ones per exact size."""
    w = _WORK.get(num_perm)
    if w is None or w[0].shape[1] < width:
        w = (np.empty((num_perm, width), np.int64),
             np.empty((num_perm, width), np.int64),
             np.empty((num_perm, width), np.int64),
             np.empty((num_perm, width), np.bool_))
        _WORK[num_perm] = w
    return w


def _affine_into(shingles: np.ndarray, a: np.ndarray, b: np.ndarray,
                 work) -> np.ndarray:
    """(num_perm × num_shingles) int64 matrix of (a*x+b) mod 2^61-1,
    computed IN PLACE in ``work`` (3 int64 + 1 bool (P, ≥S) buffers);
    returns a view of work[0] (valid until the next call with that work).

    Exact 31/30-bit limb arithmetic entirely in int64 — every intermediate
    is provably < 2^63 so nothing wraps, and no uint64 kernel is touched
    (some numpy builds run uint64 array×array multiply / where / mod
    ~100-300× slower than int64).  Derivation with M = 2^61-1,
    a = ah·2^31+al, x = xh·2^31+xl (ah,xh < 2^30; al,xl < 2^31):
    a·x = ah·xh·2^62 + (ah·xl + al·xh)·2^31 + al·xl, and 2^62 ≡ 2,
    2^61 ≡ 1 (mod M); the cross term folds once, then splits again so its
    ·2^31 never overflows, and t1+t3 folds before adding t2+b (the 4-term
    sum can reach 2^63 and wrap — mod 2^64 ≡ −8 mod M, a real off-by-8 bug
    caught by the bit-identity check against the previous uint64 kernel).
    Bit-identical to that kernel over random + edge inputs."""
    M61 = np.int64((1 << 61) - 1)
    S = shingles.size
    P = a.shape[0]
    B1, B2, B3, BB = (w[:, :S] for w in work)
    x = shingles.astype(np.int64, copy=False) & M61      # low 61 bits, ≥ 0
    ah, al = (a >> np.int64(31))[:, None], (a & np.int64((1 << 31) - 1))[:, None]
    xh, xl = (x >> np.int64(31))[None, :], (x & np.int64((1 << 31) - 1))[None, :]
    np.multiply(ah, xl, out=B1)
    np.multiply(al, xh, out=B2)
    B1 += B2                                             # cross < 2^62
    np.bitwise_and(B1, M61, out=B2)
    B1 >>= np.int64(61)
    B2 += B1                                             # c ≤ M61+1
    # c·2^31 = ch·2^61 + cl·2^31 ≡ ch + cl·2^31  (ch ≤ 2^31, cl < 2^30)
    np.right_shift(B2, np.int64(30), out=B1)             # ch
    B2 &= np.int64((1 << 30) - 1)
    B2 <<= np.int64(31)
    B2 += B1                                             # t2
    np.multiply(ah, xh, out=B1)
    B1 <<= np.int64(1)                                   # t1: ·2^62 ≡ ·2
    np.multiply(al, xl, out=B3)                          # t3 < 2^62
    B1 += B3                                             # t1+t3 < 2^62+2^61
    np.bitwise_and(B1, M61, out=B3)
    B1 >>= np.int64(61)
    B3 += B1                                             # fold ≤ M61+2
    B3 += B2                                             # + t2
    B3 += b[:, None]                                     # + b: < 3·2^61
    np.bitwise_and(B3, M61, out=B1)
    B3 >>= np.int64(61)
    B1 += B3                                             # fold ≤ M61+2
    np.greater_equal(B1, np.int64(_P), out=BB)
    np.subtract(B1, np.int64(_P), out=B1, where=BB)
    return B1


def batch_signatures(
    shingle_arrays: list[np.ndarray], a: np.ndarray, b: np.ndarray,
    chunk_shingles: int = 1 << 13,
) -> np.ndarray:
    """Signatures for a whole batch of docs in one vectorized pass.

    Concatenates every doc's shingles, computes the affine matrix in
    bounded chunks (≤ chunk_shingles columns ⇒ ~8 MB per work buffer at
    128 perms) written into the per-process reusable workspace, and takes
    per-doc minima with ``np.minimum.reduceat`` — no per-doc Python beyond
    building the offsets, no fresh large temporaries after the first call
    in a worker process.  Empty docs get the all-``_P`` sentinel (same as
    ``minhash_signature``)."""
    num_perm = a.shape[0]
    n_docs = len(shingle_arrays)
    sigs = np.full((n_docs, num_perm), _P, dtype=np.int64)
    lens = np.fromiter((s.size for s in shingle_arrays), dtype=np.int64,
                       count=n_docs)
    nonempty = np.flatnonzero(lens)
    if nonempty.size == 0:
        return sigs
    cat = np.concatenate([shingle_arrays[i] for i in nonempty])
    offsets = np.zeros(nonempty.size, dtype=np.int64)
    np.cumsum(lens[nonempty][:-1], out=offsets[1:])
    # a chunk is doc-aligned, so it can overshoot chunk_shingles by up to
    # the last doc's shingle count — size the workspace for the worst case
    max_len = int(lens.max())
    work = _get_work(num_perm, chunk_shingles + max_len)
    # chunk along the shingle axis, aligned to doc boundaries
    start_doc = 0
    while start_doc < nonempty.size:
        end_doc = start_doc + 1
        start_off = offsets[start_doc]
        while (end_doc < nonempty.size
               and offsets[end_doc] - start_off < chunk_shingles):
            end_doc += 1
        end_off = (offsets[end_doc] if end_doc < nonempty.size else cat.size)
        m = _affine_into(cat[start_off:end_off], a, b, work)  # (P, S_chunk)
        local_off = (offsets[start_doc:end_doc] - start_off)
        mins = np.minimum.reduceat(m, local_off, axis=1)  # (P, docs_chunk)
        sigs[nonempty[start_doc:end_doc]] = mins.T
        start_doc = end_doc
    return sigs


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
