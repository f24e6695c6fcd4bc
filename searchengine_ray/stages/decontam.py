"""Benchmark decontamination: remove training documents that overlap an
evaluation set by any k-token n-gram (the GPT-3 13-gram filter, Brown et
al. 2020 Appendix C; the reference engine has no analog — this is part of
the §"beyond the reference" training-pipeline set).

Shape at 100 TB: the BENCHMARK side is small by nature (eval suites are
MBs, not TBs), so its distinct gram-hash set is collected once on the
driver and broadcast via ``ray.put`` — every train batch then probes it
with one vectorized ``searchsorted`` pass.  The train side never shuffles:
the whole operator is map-only over the training corpus, which is the only
shape that survives 10^10 documents.  The driver collect is bounded by the
benchmark's distinct gram count (asserted via ``max_bench_grams``), never
by corpus size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
from ray.data import Dataset

from searchengine_ray.functions.ngrams import overlapping_gram_hashes
from searchengine_ray.stages.text import simple_tokens

DEFAULT_GRAM_K = 4


def _doc_gram_arrays(texts, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc distinct overlapping-gram hashes, flattened: returns
    (flat int64 hashes, doc_idx int64).  The only per-row Python is the
    blake2b hashing itself (same cost floor as ``explode_shingles``)."""
    arrs = [
        np.fromiter(g, dtype=np.int64, count=len(g))
        for g in (overlapping_gram_hashes(simple_tokens(t or ""), k)
                  for t in texts)
    ]
    ndocs = len(arrs)
    lens = np.fromiter((a.size for a in arrs), dtype=np.int64, count=ndocs)
    flat = (np.concatenate(arrs) if ndocs and lens.sum()
            else np.array([], dtype=np.int64))
    doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), lens)
    return flat, doc_idx


def collect_bench_grams(
    bench: Dataset, gram_k: int = DEFAULT_GRAM_K,
    text_col: str = "text", max_bench_grams: int = 50_000_000,
):
    """Distinct gram hashes of the benchmark corpus as a SORTED int64 numpy
    array in the object store (``ray.put`` ref).  Per-batch distinct first,
    driver-side ``np.unique`` second — the driver holds O(bench grams)
    int64s (8 B each; 50M cap = 400 MB), never anything corpus-scaled."""

    def batch_grams(df: pd.DataFrame) -> pd.DataFrame:
        flat, _ = _doc_gram_arrays(df[text_col], gram_k)
        return pd.DataFrame({"g": np.unique(flat)})

    parts = bench.map_batches(batch_grams, batch_format="pandas",
                              batch_size=1024).to_pandas()
    grams = np.unique(parts["g"].to_numpy(np.int64))
    if grams.size > max_bench_grams:
        raise ValueError(
            f"benchmark gram set ({grams.size}) exceeds max_bench_grams="
            f"{max_bench_grams}; is the benchmark side really the small one?")
    return ray.put(grams)


def decontaminate(
    train: Dataset, bench_grams_ref, gram_k: int = DEFAULT_GRAM_K,
    text_col: str = "text", id_col: str = "doc_id",
) -> Dataset:
    """Flag every train doc against the broadcast benchmark gram set:
    output (id_col, n_shared, contaminated) — ``n_shared`` = how many of the
    doc's DISTINCT k-grams appear in the benchmark, ``contaminated`` =
    n_shared > 0.  Map-only; filter on ``~contaminated`` downstream (kept
    as a flag so the caller can audit what a hard filter would drop)."""

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        bench = ray.get(bench_grams_ref)  # zero-copy view per worker
        flat, doc_idx = _doc_gram_arrays(df[text_col], gram_k)
        if flat.size and bench.size:
            pos = np.searchsorted(bench, flat)
            pos[pos == bench.size] = 0
            hit = bench[pos] == flat
        else:
            hit = np.zeros(flat.size, dtype=bool)
        n_shared = np.bincount(doc_idx[hit], minlength=len(df)).astype(np.int64)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "n_shared": n_shared,
            "contaminated": n_shared > 0,
        })

    return train.map_batches(probe, batch_format="pandas", batch_size=1024)
