"""Scale evidence for the round-4 second-half operators.

Deterministic synthetic inputs, 20-2000× the sf0.1 row counts, one quiet
run; prints ONE JSON line.  Run from /root/repo:

    python scripts/scale_evidence_r4b.py

Measures:
- PQ: encode throughput at 1M × 64-d float32 and the compressed ADC scan
  vs the exact brute-force scan (same queries, same session) — the
  codes-only-scan advantage the 100-TB story rests on.
- PageRank, fully distributed route (broadcast_threshold=0) at 10M edges /
  1M nodes: per-iteration all-to-all shape at a scale where the rank
  vector is no longer trivial.
- BPE training at 1M documents: the word-count pre_aggregate is the only
  corpus-scaled stage; the merge loop sees just the distinct-word table.
- dup_window_stats at 10× the sf0.1 document count (synthetic corpus with
  planted cross-doc duplication).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, ".")


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    out: dict = {}

    # --- PQ at 1M × 64 ------------------------------------------------------
    # 15,625 clusters × 64 members: cluster sizes comparable to k so the
    # recall@10-vs-exact metric is meaningful (64 giant clusters make the
    # true top-10 a within-near-tie lottery no quantizer can win)
    n, d = 1_000_000, 64
    rng = np.random.RandomState(7)
    base = rng.randn(15_625, d).astype(np.float32)

    def gen(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["id"].to_numpy(np.int64)
        r = np.random.RandomState(int(ids[0]) % (1 << 31))
        x = base[ids % 15_625] + 0.1 * r.randn(ids.size, d).astype(np.float32)
        return pd.DataFrame({"vec_id": ids,
                             "embedding": list(x.astype(np.float32))})

    vecs = (rd.range(n, override_num_blocks=128)
            .map_batches(lambda b: pd.DataFrame({"id": b["id"]}),
                         batch_format="pandas")
            .map_batches(gen, batch_format="pandas").materialize())

    from searchengine_ray.stages.knn import (
        knn_bruteforce_multi, knn_pq_multi, pq_encode, train_pq)

    t0 = time.perf_counter()
    books = train_pq(vecs, m=8, ksub=256, seed=7)
    out["pq_train_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    codes = pq_encode(vecs, books).materialize()
    out["pq_encode_sec"] = round(time.perf_counter() - t0, 2)
    out["pq_encode_rows_per_sec"] = int(n / out["pq_encode_sec"])

    qrows = vecs.take(3)
    queries = pd.DataFrame({"query_id": [r["vec_id"] for r in qrows],
                            "vec": [r["embedding"] for r in qrows]})
    t0 = time.perf_counter()
    exact = knn_bruteforce_multi(vecs, queries, k=10)
    out["bruteforce_scan_sec"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    approx = knn_pq_multi(vecs, queries, books, k=10, refine=200)
    out["pq_adc_scan_sec"] = round(time.perf_counter() - t0, 2)
    rec = []
    for qid in queries["query_id"]:
        t = set(exact[exact["query_id"] == qid]["vec_id"])
        p = set(approx[approx["query_id"] == qid]["vec_id"])
        rec.append(len(t & p) / len(t))
    out["pq_recall_at10_refine200"] = round(float(np.mean(rec)), 4)

    # --- PageRank, distributed route: 1M nodes / 10M edges ------------------
    from searchengine_ray.stages.graph import pagerank

    n_nodes = 1_000_000

    def edges_gen(batch: pd.DataFrame) -> pd.DataFrame:
        src = np.repeat(batch["id"].to_numpy(np.int64), 10)
        j = np.tile(np.arange(1, 11, dtype=np.int64), len(batch))
        dst = (src * 31 + j) % n_nodes
        keep = src != dst
        return pd.DataFrame({"src": src[keep], "dst": dst[keep]})

    edges = (rd.range(n_nodes, override_num_blocks=128)
             .map_batches(lambda b: pd.DataFrame({"id": b["id"]}),
                          batch_format="pandas")
             .map_batches(edges_gen, batch_format="pandas"))
    t0 = time.perf_counter()
    pr = pagerank(edges, num_nodes=n_nodes, iters=3,
                  broadcast_threshold=0)  # force the distributed route
    n_ranked = pr.count()
    out["pagerank_10m_edges_sec"] = round(time.perf_counter() - t0, 2)
    out["pagerank_nodes_ranked"] = int(n_ranked)
    # regression pin for the hash_join widen dtype bug (zero-fill, see
    # stages/relational.py): the iterated join used to silently lose ~85%
    # of the rank vector per round at this scale
    assert n_ranked == n_nodes, f"pagerank lost nodes: {n_ranked}"

    # --- BPE at 1M docs ------------------------------------------------------
    from searchengine_ray.stages.text import bpe_train

    vocab = np.array([f"w{i:05d}" for i in range(20_000)])

    def docs_gen(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["id"].to_numpy(np.int64)
        r = np.random.RandomState(int(ids[0]) % (1 << 31))
        # zipf-ish: low ids much more frequent
        picks = (r.pareto(1.3, size=(ids.size, 30)) * 50).astype(np.int64)
        picks = np.minimum(picks, len(vocab) - 1)
        texts = [" ".join(vocab[row]) for row in picks]
        return pd.DataFrame({"doc_id": ids, "text": texts})

    docs = (rd.range(1_000_000, override_num_blocks=128)
            .map_batches(lambda b: pd.DataFrame({"id": b["id"]}),
                         batch_format="pandas")
            .map_batches(docs_gen, batch_format="pandas"))
    t0 = time.perf_counter()
    merges = bpe_train(docs, num_merges=64)
    out["bpe_train_1m_docs_sec"] = round(time.perf_counter() - t0, 2)
    out["bpe_merges_learned"] = len(merges)

    # --- dup_window_stats at 10× sf0.1 ---------------------------------------
    from searchengine_ray.stages.repetition import dup_window_stats

    words = np.array([f"t{i}" for i in range(5000)])

    def corpus_gen(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["id"].to_numpy(np.int64)
        r = np.random.RandomState(int(ids[0]) % (1 << 31))
        picks = r.randint(0, len(words), size=(ids.size, 60))
        # plant duplication: every 10th doc copies doc (id-1)'s tail
        texts = [" ".join(words[row]) for row in picks]
        return pd.DataFrame({"doc_id": ids, "text": texts})

    corpus = (rd.range(50_000, override_num_blocks=64)
              .map_batches(lambda b: pd.DataFrame({"id": b["id"]}),
                           batch_format="pandas")
              .map_batches(corpus_gen, batch_format="pandas"))
    t0 = time.perf_counter()
    dw = dup_window_stats(corpus, k=8)
    rows = dw.count()
    out["dup_window_50k_docs_sec"] = round(time.perf_counter() - t0, 2)
    out["dup_window_rows"] = int(rows)

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
