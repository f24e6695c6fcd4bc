"""DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
2023): select raw-corpus documents whose hashed n-gram distribution matches
a small target corpus, the standard recipe for building a domain-matched
pretraining mix from a web crawl.

Shape: unigrams+bigrams hash into ``n_buckets`` (the paper's hashed
feature space); bag-of-buckets unigram LMs for target and raw fit from
counts with add-one smoothing; each doc scores
log w = Σ_b c_b(doc) · ln(p_target(b) / q_raw(b)), and the selection is
the global top-k by (rounded score, doc_id).

Scale shape: two count passes (ONE ``pre_aggregate`` each — the only
all-to-alls, O(n_buckets) rows out), the O(B) log-ratio table broadcast
via ``ray.put``, scoring map-only, selection via two-level ``global_topk``
— the corpus itself never shuffles.  100-TB note: the target side is an
eval/domain sample, small by nature; the raw count pass is the same
pre-aggregated shuffle volume as token_df.

SQL parity: each bucket's log-ratio is ln of a ratio of EXACT integers
(the PMI discipline) — numerators/denominators are computed in Python
ints (no int64 overflow at any corpus size) and converted by
correctly-rounded float division, which matches DuckDB's
``ln(CAST(num AS DOUBLE) / CAST(den AS DOUBLE))`` bit-for-bit; per-doc
sums differ only in summation order below the round-6 emission grain.
Bucket assignment is the house hash: ``sha256(gram:salt)[:12]`` hex →
int64 % n_buckets, mirrored as ``CAST('0x' || substr(sha256(...), 1, 12)
AS BIGINT) % B``.
"""

from __future__ import annotations

from hashlib import sha256

import numpy as np
import pandas as pd
import ray
from ray.data import Dataset

from searchengine_ray.stages.relational import global_topk, pre_aggregate
from searchengine_ray.stages.text import simple_tokens


def doc_grams(text: str) -> list[str]:
    """Unigrams + space-joined bigrams over the SQL-parity tokenizer."""
    toks = simple_tokens(text or "")
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def gram_buckets(grams: list[str], salt: str, n_buckets: int) -> np.ndarray:
    """House-hash bucket per gram (sha256 C-call loop — the same map-only
    cost floor sampling.hash_hex pays; embarrassingly parallel)."""
    out = np.empty(len(grams), dtype=np.int64)
    for i, g in enumerate(grams):
        out[i] = int(sha256(f"{g}:{salt}".encode()).hexdigest()[:12], 16)
    return out % n_buckets


def paired_bucket_counts(
    ds: Dataset, salt: str, n_buckets: int, text_col: str,
    mask_col: str,
) -> tuple[np.ndarray, np.ndarray]:
    """(target, raw) gram-instance counts per bucket in ONE corpus pass
    (the target is a subset of raw, so one tokenization serves both):
    per-batch bincount partials with two count columns → one
    ``pre_aggregate`` → O(n_buckets) driver rows."""

    def part(df: pd.DataFrame) -> pd.DataFrame:
        ct = np.zeros(n_buckets, dtype=np.int64)
        cq = np.zeros(n_buckets, dtype=np.int64)
        m = df[mask_col].astype(bool).to_numpy()
        for is_t, t in zip(m, df[text_col]):
            g = doc_grams(t)
            if not g:
                continue
            bc = np.bincount(gram_buckets(g, salt, n_buckets),
                             minlength=n_buckets)
            cq += bc
            if is_t:
                ct += bc
        nz = np.nonzero(cq)[0]
        return pd.DataFrame({"b": nz, "ct": ct[nz], "cq": cq[nz]})

    agg = pre_aggregate(ds.map_batches(part, batch_format="pandas"),
                        ["b"], {"ct": ("ct", "sum"),
                                "cq": ("cq", "sum")}).to_pandas()
    t = np.zeros(n_buckets, dtype=np.int64)
    q = np.zeros(n_buckets, dtype=np.int64)
    bi = agg["b"].to_numpy(np.int64)
    t[bi] = agg["ct"].to_numpy(np.int64)
    q[bi] = agg["cq"].to_numpy(np.int64)
    return t, q


def dsir_log_ratio(t_counts: np.ndarray, q_counts: np.ndarray) -> np.ndarray:
    """Per-bucket ln(p_target / q_raw) with add-one smoothing, as ln of a
    ratio of exact integers: (t_b+1)(q_tot+B) / (q_b+1)(t_tot+B).
    Products run in Python ints (overflow-free at any corpus size); the
    float division is correctly rounded, matching DuckDB's CAST/CAST
    division exactly, so both engines feed ln the identical double."""
    n_b = len(t_counts)
    t_tot = int(t_counts.sum()) + n_b
    q_tot = int(q_counts.sum()) + n_b
    ratios = np.array([
        float((int(t) + 1) * q_tot) / float((int(q) + 1) * t_tot)
        for t, q in zip(t_counts, q_counts)])
    return np.log(ratios)


def dsir_scores(
    ds: Dataset, log_ratio: np.ndarray, salt: str,
    text_col: str = "text", id_col: str = "doc_id", round_to: int = 6,
) -> Dataset:
    """Map-only per-doc importance score: Σ_b c_b · logr[b], rounded.
    The O(B) log-ratio table broadcasts once via ``ray.put``."""
    n_buckets = len(log_ratio)
    ref = ray.put(np.asarray(log_ratio, dtype=np.float64))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        lr = ray.get(ref)  # plasma-local, zero-copy
        ids = df[id_col].to_numpy(np.int64)
        s = np.zeros(len(df), dtype=np.float64)
        for i, t in enumerate(df[text_col]):
            g = doc_grams(t)
            if not g:
                continue
            ub, c = np.unique(gram_buckets(g, salt, n_buckets),
                              return_counts=True)
            s[i] = (c * lr[ub]).sum()
        return pd.DataFrame({id_col: ids, "score": np.round(s, round_to)})

    return ds.map_batches(score, batch_format="pandas")


def dsir_select(
    raw: Dataset, target_mask_col: str, k: int, salt: str,
    n_buckets: int = 512, text_col: str = "text", id_col: str = "doc_id",
) -> pd.DataFrame:
    """End-to-end DSIR: fit target (rows with ``target_mask_col`` set) and
    raw hashed-gram LMs, score every raw doc, return the top-k frame
    (id, score) by (score desc, id asc) — O(k) on the driver."""
    t_counts, q_counts = paired_bucket_counts(raw, salt, n_buckets,
                                              text_col, target_mask_col)
    scores = dsir_scores(raw, dsir_log_ratio(t_counts, q_counts), salt,
                         text_col, id_col)
    return global_topk(scores, ["score", id_col], [False, True], k)
