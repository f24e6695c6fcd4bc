"""Mergeable Bloom filter for join pruning.

The 100-TB use: a selective join (few left rows have a right-side match)
pays for shuffling the WHOLE left side through the exchange.  A Bloom
filter of the right keys broadcasts in ~1 MB and drops non-matching left
rows MAP-SIDE before the shuffle; false positives (rate ≈ (1−e^{−kn/m})^k)
only leak extra rows into the exchange — the exact join still removes
them, so correctness is untouched and the filter is purely a bandwidth
lever.

Per-batch filters are bitwise-OR-mergeable, so the build is one map pass
+ an O(blocks × m/8) driver OR (numpy).  Hashing is vectorized double
hashing over the pandas row hash: bit_i = (h1 + i·h2) mod m — all int64
arithmetic (this host's uint64 pathology, see CLAUDE.md).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _hash_pair(values: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Two independent-enough 63-bit hashes per value (double hashing)."""
    h1 = pd.util.hash_pandas_object(
        values, index=False, categorize=False).to_numpy(
        dtype=np.uint64).view(np.int64)
    # splitmix64-style remix for the second stream, on int64 views
    z = h1 + np.int64(-7046029254386353131)      # 0x9E3779B97F4A7C15
    z = (z ^ (z >> 30)) * np.int64(-4658895280553007687)
    z = (z ^ (z >> 27)) * np.int64(-7723592293110705685)
    h2 = z ^ (z >> 31)
    mask = np.int64((1 << 63) - 1)
    return h1 & mask, (h2 & mask) | np.int64(1)  # h2 odd ⇒ full-cycle step


class BloomFilter:
    """Fixed-size bit-array Bloom filter; ``|=`` merges equal-sized
    filters (the per-batch partial → global OR reduction)."""

    def __init__(self, m_bits: int = 1 << 23, k: int = 5):
        if m_bits <= 0 or k <= 0:
            raise ValueError("m_bits and k must be positive")
        self.m = int(m_bits)
        self.k = int(k)
        self.bits = np.zeros((self.m + 7) // 8, dtype=np.uint8)

    def add(self, values: pd.Series) -> None:
        h1, h2 = _hash_pair(values)
        for i in range(self.k):
            pos = (h1 + np.int64(i) * h2) % self.m
            np.bitwise_or.at(self.bits, pos >> 3,
                             np.uint8(1) << (pos & 7).astype(np.uint8))

    def contains(self, values: pd.Series) -> np.ndarray:
        """Vectorized membership mask (True may be a false positive)."""
        h1, h2 = _hash_pair(values)
        out = np.ones(len(values), dtype=bool)
        for i in range(self.k):
            pos = (h1 + np.int64(i) * h2) % self.m
            byte = self.bits[pos >> 3]
            out &= (byte >> (pos & 7).astype(np.uint8)) & 1 == 1
        return out

    def __ior__(self, other: "BloomFilter") -> "BloomFilter":
        if (other.m, other.k) != (self.m, self.k):
            raise ValueError("cannot merge differently-sized Bloom filters")
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self


def build_bloom(ds, col: str, m_bits: int = 1 << 23, k: int = 5,
                ) -> BloomFilter:
    """One map pass emits a per-batch partial filter; the driver ORs the
    O(blocks) partials (numpy, ~m/8 bytes each).  Size ``m_bits`` to
    ~10× the distinct key count for ~1% false positives at k=5."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = BloomFilter(m_bits, k)
        if len(df):
            b.add(df[col])
        return pd.DataFrame({"bloom": [b.bits.tobytes()]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = BloomFilter(m_bits, k)
    for blob in parts["bloom"]:
        out.bits |= np.frombuffer(blob, dtype=np.uint8)
    return out


def bloom_prefilter(ds, bloom: BloomFilter, col: str):
    """Map-only pre-shuffle pruning: keep rows whose key MIGHT be in the
    filter.  Compose with the exact join — false positives leak through
    here and die there."""
    import ray

    ref = ray.put(bloom)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        return df[ray.get(ref).contains(df[col])]

    return ds.map_batches(keep, batch_format="pandas")
