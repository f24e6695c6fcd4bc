"""Scale evidence for the round-4 third-wave operators.

Deterministic synthetic inputs, one quiet run; prints ONE JSON line.
Run from /root/repo:

    python scripts/scale_evidence_r4c.py
    GRAFT_ONLY=index_merge GRAFT_IDX_MODE=reference python scripts/scale_evidence_r4c.py

Sections (select with GRAFT_ONLY=a,b): dedup_spans, lm, index_merge.

Measures:
- remove_dup_spans at 500k docs (~30M tokens, planted + natural cross-doc
  duplicated runs): wall, token throughput — the Lee-et-al ExactSubstr
  cleaning pass at 50× the sf0.1 corpus.
- lm_perplexity: model trained on a 20k-doc bounded reference, then
  1M docs scored MAP-ONLY; scoring bigram throughput is the number the
  CCNet design rides on.
- merge_index vs full rebuild at 300k base docs + 3k delta, same session.
  GRAFT_IDX_MODE=simple|reference picks the tokenizer: the merge skips
  tokenization but pays extra df'/n' passes, so it LOSES with the cheap
  regex tokenizer and wins as per-doc tokenize cost grows (the lemmatizer
  'reference' mode; HTML parse more so) — both arms recorded honestly.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np
import pandas as pd

sys.path.insert(0, ".")

VOCAB = 50_000
RUN_POOL = 1_000          # planted duplicated 12-token runs
DOC_TOKENS = 60


def _doc_batch(ids: np.ndarray, plant_dups: bool) -> pd.DataFrame:
    """Deterministic ~60-token docs over a Zipf-ish vocab; ids%20==0 get a
    shared 12-token run from a pool of RUN_POOL templates (cross-doc dups).
    The Zipf head also produces NATURAL duplicated windows, as real text
    does."""
    r = np.random.RandomState(int(ids[0]) % (1 << 31))
    texts = []
    for i in ids:
        k = DOC_TOKENS + int(i) % 7
        toks = (r.zipf(1.3, size=k) % VOCAB).astype(np.int64)
        words = [f"w{t}" for t in toks]
        if plant_dups and i % 20 == 0:
            run = int(i // 20) % RUN_POOL
            words[5:17] = [f"run{run}tok{j}" for j in range(12)]
        texts.append(" ".join(words))
    return pd.DataFrame({"doc_id": ids, "text": texts})


def _corpus(rd, n_docs: int, blocks: int, plant_dups: bool):
    return (rd.range(n_docs, override_num_blocks=blocks)
            .map_batches(lambda b: _doc_batch(
                np.asarray(b["id"], dtype=np.int64), plant_dups),
                batch_format="pandas"))


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    out: dict = {}
    only = set(filter(None, os.environ.get("GRAFT_ONLY", "").split(",")))

    def want(name: str) -> bool:
        return not only or name in only

    if want("dedup_spans"):
        from searchengine_ray.stages.repetition import remove_dup_spans

        n1 = 500_000
        docs = _corpus(rd, n1, 256, plant_dups=True).materialize()
        t0 = time.perf_counter()
        cleaned = remove_dup_spans(docs, k=8).materialize()
        t1 = time.perf_counter()
        stats = cleaned.map_batches(
            lambda df: pd.DataFrame({
                "k": [0], "docs": [len(df)],
                "toks": [int(df["n_tokens"].sum())],
                "removed": [int(df["n_removed"].sum())],
                "touched": [int((df["n_removed"] > 0).sum())]}),
            batch_format="pandas").to_pandas().sum()
        out["dedup_spans"] = {
            "docs": int(stats["docs"]), "tokens": int(stats["toks"]),
            "removed_tokens": int(stats["removed"]),
            "docs_touched": int(stats["touched"]),
            "wall_s": round(t1 - t0, 1),
            "tokens_per_s": int(stats["toks"] / (t1 - t0))}

    if want("lm"):
        from searchengine_ray.stages.lm import (lm_perplexity,
                                                train_bigram_lm)

        train = _corpus(rd, 20_000, 16, plant_dups=False).materialize()
        t0 = time.perf_counter()
        model = train_bigram_lm(train)
        t_train = time.perf_counter() - t0
        n2 = 1_000_000
        score_docs = _corpus(rd, n2, 256, plant_dups=False).materialize()
        t0 = time.perf_counter()
        scored = lm_perplexity(score_docs, model)
        agg = scored.map_batches(
            lambda df: pd.DataFrame({"k": [0], "docs": [len(df)],
                                     "bg": [int(df["n_bigrams"].sum())]}),
            batch_format="pandas").to_pandas().sum()
        t_score = time.perf_counter() - t0
        out["lm_perplexity"] = {
            "train_docs": 20_000, "train_wall_s": round(t_train, 1),
            "model_rows": int(model.uni_h.size + model.bg_h.size),
            "score_docs": int(agg["docs"]),
            "score_bigrams": int(agg["bg"]),
            "score_wall_s": round(t_score, 1),
            "bigrams_per_s": int(agg["bg"] / t_score)}

    if want("index_merge"):
        from searchengine_ray.pipelines.index_pipeline import (
            build_postings, merge_index, write_index)

        mode = os.environ.get("GRAFT_IDX_MODE", "simple")
        n3 = 300_000
        base = _corpus(rd, n3, 128, plant_dups=False).materialize()
        delta = _corpus(rd, 3_000, 4, plant_dups=False).map_batches(
            lambda df: df.assign(doc_id=df["doc_id"] + n3),
            batch_format="pandas").materialize()
        scratch = tempfile.mkdtemp(prefix="graft_scale_idx_")
        t0 = time.perf_counter()
        write_index(build_postings(base, mode=mode), scratch)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        summary = merge_index(scratch, delta, mode=mode)
        t_merge = time.perf_counter() - t0
        scratch2 = tempfile.mkdtemp(prefix="graft_scale_idx2_")
        both = base.union(delta).materialize()
        t0 = time.perf_counter()
        write_index(build_postings(both, mode=mode), scratch2)
        t_rebuild = time.perf_counter() - t0
        out["index_merge"] = {
            "mode": mode, "base_docs": n3, "delta_docs": 3_000,
            "n_postings": summary["n_postings"],
            "initial_build_s": round(t_build, 1),
            "merge_s": round(t_merge, 1),
            "rebuild_s": round(t_rebuild, 1),
            "merge_vs_rebuild": round(t_merge / t_rebuild, 2)}
        import shutil
        shutil.rmtree(scratch, ignore_errors=True)
        shutil.rmtree(scratch2, ignore_errors=True)

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
