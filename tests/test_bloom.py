"""Bloom filter: no false negatives ever, measured false-positive rate
near theory, OR-merge ≡ single-filter build, join pruning ratio."""

import numpy as np
import pandas as pd
import pytest

from searchengine_ray.state.bloom import (BloomFilter, bloom_prefilter,
                                          build_bloom)


def test_no_false_negatives_and_fp_rate():
    rng = np.random.RandomState(2)
    # NOT rng.choice(10**9, replace=False): that materializes a 1e9-entry
    # permutation (~8 GB, ~100 s on this host's first-touch pathology)
    members = pd.Series(np.unique(rng.randint(0, 10**9, 6000))[:5000])
    assert len(members) == 5000
    b = BloomFilter(m_bits=1 << 16, k=5)
    b.add(members)
    assert b.contains(members).all()  # the hard guarantee
    probe = pd.Series(np.arange(2 * 10**9, 2 * 10**9 + 20000))
    fp = b.contains(probe).mean()
    # theory at n=5000, m=65536, k=5: (1-e^{-kn/m})^k ≈ 0.022
    assert fp < 0.05, fp


def test_string_keys():
    b = BloomFilter(m_bits=1 << 14, k=4)
    vals = pd.Series([f"url-{i}" for i in range(800)])
    b.add(vals)
    assert b.contains(vals).all()
    other = pd.Series([f"other-{i}" for i in range(5000)])
    assert b.contains(other).mean() < 0.1


def test_or_merge_equals_single_build():
    rng = np.random.RandomState(7)
    a = pd.Series(rng.choice(10**6, 1000, replace=False))
    parts = [a.iloc[:300], a.iloc[300:700], a.iloc[700:]]
    merged = BloomFilter(1 << 15, 5)
    for p in parts:
        f = BloomFilter(1 << 15, 5)
        f.add(p)
        merged |= f
    single = BloomFilter(1 << 15, 5)
    single.add(a)
    assert np.array_equal(merged.bits, single.bits)
    with pytest.raises(ValueError, match="differently-sized"):
        merged.__ior__(BloomFilter(1 << 14, 5))


def test_build_and_prefilter_pruning(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(3)
    right = pd.DataFrame({"k": np.arange(0, 10_000, 100, dtype=np.int64)})
    left = pd.DataFrame({"k": rng.randint(0, 10_000, 50_000).astype(np.int64),
                         "v": rng.rand(50_000)})
    b = build_bloom(rd.from_pandas(right).repartition(4), "k",
                    m_bits=1 << 16, k=5)
    kept = bloom_prefilter(rd.from_pandas(left).repartition(4), b,
                           "k").to_pandas()
    true_mask = left["k"].isin(set(right["k"]))
    # every true match survives the filter
    assert true_mask.sum() <= len(kept)
    assert set(left[true_mask]["k"]) <= set(kept["k"])
    # and the pruning is real: ~1% selectivity → kept ≪ left
    assert len(kept) < 0.05 * len(left), len(kept)
