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
    passthrough: bool = False,
) -> Dataset:
    """Flag every train doc against the broadcast benchmark gram set:
    output (id_col, n_shared, contaminated) — ``n_shared`` = how many of the
    doc's DISTINCT k-grams appear in the benchmark, ``contaminated`` =
    n_shared > 0.  Map-only; filter on ``~contaminated`` downstream (kept
    as a flag so the caller can audit what a hard filter would drop).
    ``passthrough=True`` appends the two flag columns to the input rows
    instead (for in-pipeline filtering without a join back)."""

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
        if passthrough:
            return df.assign(n_shared=n_shared, contaminated=n_shared > 0)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "n_shared": n_shared,
            "contaminated": n_shared > 0,
        })

    return train.map_batches(probe, batch_format="pandas", batch_size=1024)


# ---------------------------------------------------------------------------
# Fuzzy decontamination: MinHash-LSH near-dup between the training corpus
# and a small benchmark corpus — catches the paraphrased/partially-edited
# benchmark leaks the exact k-gram filter above misses.  Same asymmetric
# shape: the benchmark's banded index + shingle sets are built once and
# broadcast (numpy-CSR, no Python dicts per the worker-replica discipline),
# so the train side stays MAP-ONLY: per batch one vectorized signing pass
# (the shared ``batch_signatures`` workspace kernel), one searchsorted band
# probe, then exact Jaccard verification on the (rare, pair-scaled)
# candidates.  Zero shuffles at any corpus size; LSH parameters are the
# oracle-proven 32 bands × r=4 of ``minhash_lsh_candidates``.
# ---------------------------------------------------------------------------


class BenchIndex:
    """Broadcast-friendly benchmark index: unique band digests with a CSR
    digest→row map, plus CSR shingle sets — all numpy (int64), ~(16 B per
    band + 8 B per shingle) per bench doc."""

    __slots__ = ("uniq", "row_starts", "rows", "ids",
                 "sh_flat", "sh_offsets", "sizes")

    def __init__(self, uniq, row_starts, rows, ids, sh_flat, sh_offsets):
        self.uniq = uniq
        self.row_starts = row_starts
        self.rows = rows
        self.ids = ids
        self.sh_flat = sh_flat
        self.sh_offsets = sh_offsets
        self.sizes = np.diff(sh_offsets)

    def shingles(self, row: int) -> np.ndarray:
        return self.sh_flat[self.sh_offsets[row]:self.sh_offsets[row + 1]]


def build_bench_index(
    bench: Dataset, shingle_n: int = 3, num_perm: int = 128,
    num_bands: int = 32, text_col: str = "text", id_col: str = "doc_id",
    max_bench_docs: int = 2_000_000,
):
    """Benchmark corpus → ``ray.put`` ref of a ``BenchIndex``.  The collect
    is bounded by the benchmark size (``max_bench_docs``) — same smallness
    contract as ``collect_bench_grams``."""
    from searchengine_ray.functions.minhash import (
        band_digests, batch_signatures, make_coeffs)
    from searchengine_ray.functions.ngrams import shingle_hashes

    a, b = make_coeffs(num_perm)

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        shs = [np.sort(np.fromiter(s, dtype=np.int64, count=len(s)))
               for s in (shingle_hashes(simple_tokens(t or ""), shingle_n)
                         for t in df[text_col])]
        sigs = batch_signatures(shs, a, b)
        digs = band_digests(sigs, num_bands)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "digs": list(digs),
            "shs": shs,
        })

    rows = bench.map_batches(prep, batch_format="pandas",
                             batch_size=1024).to_pandas()
    if rows.empty:  # empty bench ⇒ empty (schema-less) collect
        rows = pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "digs": [], "shs": []})
    if len(rows) > max_bench_docs:
        raise ValueError(
            f"benchmark has {len(rows)} docs > max_bench_docs="
            f"{max_bench_docs}; the broadcast index assumes a small bench")
    n = len(rows)
    ids = rows[id_col].to_numpy()
    sh_list = [np.asarray(s, dtype=np.int64) for s in rows["shs"]]
    sh_offsets = np.zeros(n + 1, dtype=np.int64)
    if n:
        np.cumsum([s.size for s in sh_list], out=sh_offsets[1:])
    sh_flat = (np.concatenate(sh_list) if n and sh_offsets[-1]
               else np.array([], dtype=np.int64))
    digs = (np.vstack(list(rows["digs"])) if n
            else np.zeros((0, num_bands), dtype=np.int64))
    flat_d = digs.ravel()
    row_of = np.repeat(np.arange(n, dtype=np.int64), num_bands)
    order = np.argsort(flat_d, kind="stable")
    sorted_d, sorted_rows = flat_d[order], row_of[order]
    uniq, starts = np.unique(sorted_d, return_index=True)
    row_starts = np.append(starts, sorted_d.size).astype(np.int64)
    return ray.put(BenchIndex(uniq, row_starts, sorted_rows, ids,
                              sh_flat, sh_offsets))


def minhash_cross_neardup(
    train: Dataset, bench_index_ref, threshold: float = 0.65,
    shingle_n: int = 3, num_perm: int = 128, num_bands: int = 32,
    text_col: str = "text", id_col: str = "doc_id", round_to: int = 6,
) -> Dataset:
    """(train_doc, bench_doc, jaccard) pairs with jaccard > threshold —
    candidates from banded-LSH collisions against the broadcast index,
    verified exactly (sorted-array intersection; the per-candidate loop is
    pair-scaled, not corpus-scaled).  Empty shingle sets never pair
    (jaccard ≡ 0, the ``ngrams.jaccard`` convention)."""
    from searchengine_ray.functions.minhash import (
        band_digests, batch_signatures, make_coeffs)
    from searchengine_ray.functions.ngrams import shingle_hashes

    a, b = make_coeffs(num_perm)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        idx: BenchIndex = ray.get(bench_index_ref)
        shs = [np.sort(np.fromiter(s, dtype=np.int64, count=len(s)))
               for s in (shingle_hashes(simple_tokens(t or ""), shingle_n)
                         for t in df[text_col])]
        sigs = batch_signatures(shs, a, b)
        digs = band_digests(sigs, num_bands)
        flat_d = digs.ravel()
        doc_of = np.repeat(np.arange(len(df), dtype=np.int64), num_bands)
        pos = np.searchsorted(idx.uniq, flat_d)
        pos[pos == idx.uniq.size] = 0
        hit = idx.uniq.size > 0
        m = (idx.uniq[pos] == flat_d) if hit else np.zeros(0, dtype=bool)
        pos, docs = pos[m], doc_of[m]
        if pos.size:
            counts = idx.row_starts[pos + 1] - idx.row_starts[pos]
            gather = (np.repeat(idx.row_starts[pos], counts)
                      + _ranges(counts))
            cand_bench = idx.rows[gather]
            cand_doc = np.repeat(docs, counts)
            key = cand_doc * np.int64(len(idx.ids) + 1) + cand_bench
            _, first = np.unique(key, return_index=True)
            cand_doc, cand_bench = cand_doc[first], cand_bench[first]
        else:
            cand_doc = cand_bench = np.array([], dtype=np.int64)
        ids = df[id_col].to_numpy()
        keep_d, keep_b, out_j = [], [], []
        for di, bi in zip(cand_doc.tolist(), cand_bench.tolist()):
            sa = shs[di]
            sb = idx.shingles(bi)
            union = sa.size + sb.size
            if union == 0:
                continue
            shared = np.intersect1d(sa, sb, assume_unique=True).size
            j = shared / (union - shared)
            if j > threshold:
                keep_d.append(di)
                keep_b.append(bi)
                out_j.append(round(j, round_to))
        return pd.DataFrame({
            id_col: ids[np.asarray(keep_d, dtype=np.int64)],
            "bench_id": idx.ids[np.asarray(keep_b, dtype=np.int64)],
            "jaccard": np.asarray(out_j, dtype=np.float64),
        })

    return train.map_batches(probe, batch_format="pandas", batch_size=1024)


def _ranges(counts: np.ndarray) -> np.ndarray:
    """[3, 1, 2] → [0, 1, 2, 0, 0, 1] (vectorized per-segment arange)."""
    if not counts.size:
        return np.array([], dtype=np.int64)
    total = int(counts.sum())
    starts = np.repeat(np.cumsum(counts) - counts, counts)
    return np.arange(total, dtype=np.int64) - starts
