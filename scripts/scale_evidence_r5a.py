"""Round-5 scale evidence: phash near-dup A/B attribution + distributed LPA.

Deterministic synthetic inputs, one quiet session; prints ONE JSON line.
Run from /root/repo:

    python scripts/scale_evidence_r5a.py

Measures:
- phash_ab_bench_size: the benched `image_phash_neardup` entry (611-row
  image table) with the r4 chunked-triangle `pairs_bucket` vs a
  reconstructed r3-style pandas self-merge bucket kernel, arms INTERLEAVED
  A/B/A/B ×3 in one session — attribution for the 3.28 s → 6.21 s r3→r4
  bench delta (if the arms tie, the delta was ambient drift, not the
  chunk-bounding).
- phash_ab_100k: the same two kernels at 100k signatures with a planted
  5k-member hot bucket (≈12.5M candidate pairs in ONE group, ~0
  survivors) — the skew case the chunked triangle exists for: the merge
  arm must materialize every candidate as rows before filtering, the
  chunked arm touches them 16 MB at a time.
- lpa_10m: label_propagation at 10M edges / 1M nodes (hot-node skew),
  broadcast route vs the round-5 fully distributed route
  (broadcast_threshold=0, labels stay a Dataset; per round ONE hash_join
  + ONE pre_aggregate + ONE bucketed_apply + ONE anti-join — shuffle
  volume O(E) rows per round), with a full label-table checksum pinning
  the routes identical at scale.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, ".")


def _merge_pairs_route(ds, hash_col, id_col, max_hamming):
    """Reconstruction of the r3-era flat self-merge bucket kernel (same
    band explode, same dedup co-shuffle) for the A/B arms."""
    import ray.data as rd  # noqa: F401

    from searchengine_ray.functions.phash import hamming64_pairs
    from searchengine_ray.stages.relational import bucketed_apply

    num_bands = max_hamming + 1
    width = 64 // num_bands

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        h = df[hash_col].to_numpy(dtype=np.int64).view(np.uint64)
        ids = df[id_col].to_numpy()
        frames = []
        for b in range(num_bands):
            lo = b * width
            hi = 64 if b == num_bands - 1 else lo + width
            bv = ((h >> np.uint64(lo)) & np.uint64((1 << (hi - lo)) - 1))
            frames.append(pd.DataFrame({
                "id": ids,
                "band_id": np.full(len(df), b, dtype=np.int32),
                "band_val": bv.view(np.int64),
                "sig": h.view(np.int64)}))
        return pd.concat(frames, ignore_index=True)

    bands = ds.map_batches(explode, batch_format="pandas")

    def pairs_bucket_merge(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on=["band_id", "band_val"], suffixes=("_a", "_b"))
        m = m[m["id_a"] < m["id_b"]]
        ham = hamming64_pairs(m["sig_a"].to_numpy(np.int64),
                              m["sig_b"].to_numpy(np.int64))
        keep = ham <= max_hamming
        return pd.DataFrame({"id_a": m["id_a"].to_numpy()[keep],
                             "id_b": m["id_b"].to_numpy()[keep],
                             "hamming": ham[keep]})

    cand = bucketed_apply(bands, ["band_id", "band_val"], pairs_bucket_merge)
    return bucketed_apply(cand, ["id_a", "id_b"],
                          lambda g: g.drop_duplicates(["id_a", "id_b"]))


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    from searchengine_ray.stages.dedup import hash_neardup_pairs

    DataContext.get_current().enable_progress_bars = False
    out: dict = {}

    # --- 1. interleaved A/B at the benched size ------------------------------
    from searchengine_ray.sources.image_table import ensure_image_table

    img = ensure_image_table()
    chunked, merged = [], []
    n_pairs_a = n_pairs_b = -1
    for _ in range(3):
        t0 = time.perf_counter()
        ds = rd.read_parquet(img, columns=["image_id", "phash"])
        n_pairs_a = hash_neardup_pairs(
            ds, hash_col="phash", id_col="image_id", max_hamming=4).count()
        chunked.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        ds = rd.read_parquet(img, columns=["image_id", "phash"])
        n_pairs_b = _merge_pairs_route(
            ds, hash_col="phash", id_col="image_id", max_hamming=4).count()
        merged.append(time.perf_counter() - t0)
    assert n_pairs_a == n_pairs_b, (n_pairs_a, n_pairs_b)
    out["phash_ab_bench_size"] = {
        "rows": 611, "pairs": n_pairs_a,
        "chunked_sec": [round(x, 2) for x in chunked],
        "merge_sec": [round(x, 2) for x in merged],
        "chunked_median": round(float(np.median(chunked)), 2),
        "merge_median": round(float(np.median(merged)), 2)}

    # --- 2. the skew case at 100k signatures ---------------------------------
    # 95k uniform random 64-bit signatures (flat buckets, ~24 members per
    # 12-bit band bucket) + a 5k-member HOT bucket: band0 identical, high
    # 52 bits random (expected pairwise hamming ≈ 26 ⇒ ~0 survivors, so
    # the measurement is candidate handling, not output materialization).
    rng = np.random.RandomState(11)
    flat = rng.randint(-(2 ** 63), 2 ** 63 - 1, 95_000).astype(np.int64)
    hot_hi = rng.randint(-(2 ** 63), 2 ** 63 - 1, 5_000).astype(np.int64)
    hot = ((hot_hi.view(np.uint64) >> np.uint64(12)) << np.uint64(12)
           | np.uint64(0x5A5)).view(np.int64)
    sigs = pd.DataFrame({"sid": np.arange(100_000, dtype=np.int64),
                         "h": np.concatenate([flat, hot])})
    skew_ds = rd.from_pandas(sigs).repartition(32).materialize()
    ab2 = {}
    for arm, fn in (("chunked", hash_neardup_pairs),
                    ("merge", _merge_pairs_route)):
        t0 = time.perf_counter()
        n = fn(skew_ds, hash_col="h", id_col="sid", max_hamming=4).count()
        ab2[arm + "_sec"] = round(time.perf_counter() - t0, 2)
        ab2[arm + "_pairs"] = n
    assert ab2["chunked_pairs"] == ab2["merge_pairs"]
    out["phash_ab_100k_hot5k"] = ab2

    # --- 3. LPA at 10M edges / 1M nodes, both routes -------------------------
    from searchengine_ray.stages.graph import label_propagation

    n_edges, n_nodes = 10_000_000, 1_000_000

    def gen(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["id"].to_numpy(np.int64)
        r = np.random.RandomState(int(ids[0]) % (1 << 31))
        src = (ids * np.int64(2654435761)) % n_nodes
        # hot-node skew: 10% of edges land on 100 hub dsts
        dst = r.randint(0, n_nodes, ids.size).astype(np.int64)
        hotm = r.rand(ids.size) < 0.10
        dst[hotm] = r.randint(0, 100, int(hotm.sum()))
        keep = src != dst
        return pd.DataFrame({"src": src[keep], "dst": dst[keep]})

    edges = (rd.range(n_edges, override_num_blocks=128)
             .map_batches(lambda b: pd.DataFrame({"id": b["id"]}),
                          batch_format="pandas")
             .map_batches(gen, batch_format="pandas")).materialize()

    def checksum(ds) -> int:
        def part(df: pd.DataFrame) -> pd.DataFrame:
            n = df["node"].to_numpy(np.int64)
            c = df["community"].to_numpy(np.int64)
            return pd.DataFrame({"x": [int((n * np.int64(31) + c).sum())],
                                 "k": [len(df)]})

        agg = ds.map_batches(part, batch_format="pandas").to_pandas()
        return int(agg["x"].sum()), int(agg["k"].sum())

    t0 = time.perf_counter()
    bc = label_propagation(edges, num_nodes=n_nodes, rounds=3)
    cs_bc = checksum(bc)
    bc_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    dist = label_propagation(edges, num_nodes=n_nodes, rounds=3,
                             broadcast_threshold=0)
    cs_dist = checksum(dist)
    dist_sec = time.perf_counter() - t0
    assert cs_bc == cs_dist, (cs_bc, cs_dist)
    out["lpa_10m"] = {
        "edges": n_edges, "nodes": cs_bc[1], "rounds": 3,
        "broadcast_sec": round(bc_sec, 1),
        "distributed_sec": round(dist_sec, 1),
        "routes_identical": True,
        "checksum": cs_bc[0]}

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
