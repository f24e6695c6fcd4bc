"""Scale evidence for the round-4 additions: HLL distinct sketch and
distributed k-means, at 20-2000× the sf0.1 test sizes.

Synthesizes deterministic parquet under /tmp (10M-row key table; 1M × 64
float32 embedding blobs), then times:

  1. exact COUNT(DISTINCT) (two-stage pre_aggregate — shuffles one row
     per distinct (group, key)) vs `hll_distinct_aggregate` (shuffles
     ≤ 2^p register rows per group) on the same input, and reports the
     HLL relative error per group;
  2. `kmeans_fit` full-corpus Lloyd iterations at 1M × 64, k=32 —
     the per-iteration wall cost of the pre_aggregate reduction whose
     driver traffic is k×(d+1) scalars by construction.

Run from /root/repo on a QUIET machine (cross-session timings on these
sandboxes vary ±20-40%; see CLAUDE.md):

    python scripts/scale_evidence_sketches.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

HLL_PATH = "/tmp/graft_scale/hll_events"
EMB_PATH = "/tmp/graft_scale/emb_1m"
DEDUP_PATH = "/tmp/graft_scale/emb_dedup_1m"
N_ROWS, N_DISTINCT, N_GROUPS = 10_000_000, 2_000_000, 5
N_VEC, DIM, KCENT = 1_000_000, 64, 32
N_PLANTED, K_SEMANTIC = 10_000, 1024


def ensure_tables() -> None:
    os.makedirs("/tmp/graft_scale", exist_ok=True)
    if not os.path.isdir(HLL_PATH):
        os.makedirs(HLL_PATH)
        rng = np.random.RandomState(7)
        per = N_ROWS // 8
        for shard in range(8):
            keys = rng.randint(0, N_DISTINCT, size=per).astype(np.int64)
            grp = rng.randint(0, N_GROUPS, size=per).astype(np.int64)
            pq.write_table(pa.table({"g": grp, "k": keys}),
                           f"{HLL_PATH}/part-{shard}.parquet")
    if not os.path.isdir(EMB_PATH):
        os.makedirs(EMB_PATH)
        rng = np.random.RandomState(8)
        centers = rng.randn(KCENT, DIM).astype(np.float32) * 4.0
        per = N_VEC // 8
        for shard in range(8):
            c = rng.randint(0, KCENT, size=per)
            x = centers[c] + rng.randn(per, DIM).astype(np.float32) * 0.5
            pq.write_table(pa.table({
                "vec_id": pa.array(np.arange(per) + shard * per),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(x.ravel(), type=pa.float32()), DIM)}),
                f"{EMB_PATH}/part-{shard}.parquet")
    if not os.path.isdir(DEDUP_PATH):
        # dedup corpus: 1M unstructured vectors (pairwise cosine ~0±0.13)
        # + 10k planted near-identical duplicates (id 2M+i duplicates id i)
        os.makedirs(DEDUP_PATH)
        rng = np.random.RandomState(9)
        per = N_VEC // 8
        for shard in range(8):
            x = rng.randn(per, DIM).astype(np.float32)
            ids = np.arange(per, dtype=np.int64) + shard * per
            if shard == 0:
                dup = x[:N_PLANTED] + 1e-3 * rng.randn(
                    N_PLANTED, DIM).astype(np.float32)
                x = np.vstack([x, dup])
                ids = np.concatenate([
                    ids, np.arange(N_PLANTED, dtype=np.int64) + 2_000_000])
            pq.write_table(pa.table({
                "vec_id": pa.array(ids),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(x.ravel(), type=pa.float32()), DIM)}),
                f"{DEDUP_PATH}/part-{shard}.parquet")


def main() -> None:
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    ensure_tables()
    from searchengine_ray.stages.relational import pre_aggregate
    from searchengine_ray.stages.sketches import hll_distinct_aggregate

    out: dict = {"n_rows": N_ROWS, "n_distinct_keyspace": N_DISTINCT,
                 "n_groups": N_GROUPS}

    # exact distinct: shuffles one row per distinct (g, k) — ~8.5M rows here
    t0 = time.perf_counter()
    dedup = pre_aggregate(rd.read_parquet(HLL_PATH), ["g", "k"],
                          {"_n": (None, "count")})
    exact = pre_aggregate(dedup, ["g"], {"n": (None, "count")}).to_pandas()
    out["exact_distinct_sec"] = round(time.perf_counter() - t0, 2)

    # HLL: shuffles <= 2^p register rows per group (p=12 -> 4096/group)
    t0 = time.perf_counter()
    hll = hll_distinct_aggregate(rd.read_parquet(HLL_PATH), ["g"], "k",
                                 p=12).to_pandas()
    out["hll_sec"] = round(time.perf_counter() - t0, 2)

    m = exact.merge(hll, on="g")
    rel = ((m["approx_distinct"] - m["n"]).abs() / m["n"]).to_numpy()
    out["hll_rel_err_max"] = round(float(rel.max()), 4)
    out["hll_register_rows_total"] = N_GROUPS * 4096
    out["exact_shuffle_rows_total"] = int(exact["n"].sum())

    # k-means: 1M x 64, k=32, 4 full-corpus Lloyd iterations
    from searchengine_ray.stages.kmeans import (
        kmeans_assign, kmeans_fit, semantic_dedup_pairs)
    t0 = time.perf_counter()
    cent = kmeans_fit(rd.read_parquet(EMB_PATH), num_clusters=KCENT,
                      iters=4, seed=5)
    out["kmeans_1m_fit_sec"] = round(time.perf_counter() - t0, 2)
    out["kmeans_shape"] = list(cent.shape)

    # end-to-end SemDeDup at 1M: fit k=1024, assign, within-cluster pairs;
    # recall = fraction of the 10k planted duplicate pairs recovered
    t0 = time.perf_counter()
    dedup_ds = rd.read_parquet(DEDUP_PATH)
    cent2 = kmeans_fit(dedup_ds, num_clusters=K_SEMANTIC, iters=2, seed=5)
    assigned = kmeans_assign(dedup_ds, cent2)
    pairs = semantic_dedup_pairs(assigned, threshold=0.9).to_pandas()
    out["semdedup_1m_sec"] = round(time.perf_counter() - t0, 2)
    out["semdedup_pairs"] = int(len(pairs))
    planted = {(i, 2_000_000 + i) for i in range(N_PLANTED)}
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    out["semdedup_planted_recall"] = round(
        len(planted & got) / N_PLANTED, 4)

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
