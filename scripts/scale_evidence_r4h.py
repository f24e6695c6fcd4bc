"""Scale evidence for the round-4 late operators: traced k-means,
epoch_mix, interval_join, DSIR.

Deterministic synthetic inputs at 100-800× the sf0.1 row counts, one
quiet run; prints ONE JSON line.  Run from /root/repo:

    python scripts/scale_evidence_r4h.py

Measures:
- kmeans_fit_traced at 1M × 32-d / k=32: per-iteration corpus-pass wall
  (the driver sees k×(d+3) scalars per iteration — asserted), plus the
  map-only ranked assignment.
- epoch_mix at 8M rows / 20 sources: map-only explode throughput with the
  per-source floor and expectation asserted from the aggregate.
- interval_join at 8M events × 5,000 overlapping intervals: pair
  throughput through the single co-shuffle; full-span plant intervals
  must match EVERY event (exactly-once invariant at scale), sampled
  brute-force equality on 2k events.
- DSIR at 1M docs: one paired-count pass + map-only scoring; planted
  target-vocabulary docs must dominate the selection.
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

    # --- traced k-means at 1M × 32, k=32 ------------------------------------
    from searchengine_ray.stages.kmeans import (
        kmeans_assign_ranked, kmeans_fit_traced)

    n, d, k = 1_000_000, 32, 32
    cent_true = np.random.RandomState(5).randn(k, d) * 4.0

    def mk_vec(b):
        ids = b["id"].to_numpy(np.int64)
        c = ids % k
        rng = np.random.RandomState(int(ids[0]) % 2**31)
        return pd.DataFrame({
            "vec_id": ids,
            "embedding": list((cent_true[c]
                               + 0.25 * rng.randn(len(ids), d))
                              .astype(np.float32))})

    vecs = (rd.range(n, override_num_blocks=64)
            .map_batches(mk_vec, batch_format="pandas").materialize())
    t0 = time.perf_counter()
    cent, info = kmeans_fit_traced(vecs, num_clusters=k, max_iters=5)
    fit_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_assigned = kmeans_assign_ranked(vecs, cent).count()
    assign_s = time.perf_counter() - t0
    assert n_assigned == n
    assert len(info["inertia"]) == info["n_iters"]
    tr = info["inertia"]
    assert all(tr[i + 1] <= tr[i] * 1.000001 for i in range(len(tr) - 1))
    out["kmeans_rows"] = n
    out["kmeans_iters"] = info["n_iters"]
    out["kmeans_fit_s"] = round(fit_s, 2)
    out["kmeans_rows_per_iter_s"] = int(n * info["n_iters"] / fit_s)
    out["kmeans_assign_s"] = round(assign_s, 2)

    # --- epoch_mix at 8M rows / 20 sources ----------------------------------
    from searchengine_ray.stages.sampling import epoch_mix

    n_rows = 8_000_000
    factors = {f"src{i}": [2.45, 1.0, 0.3, 1.75][i % 4] for i in range(20)}

    def mk_docs(b):
        ids = b["id"].to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id": ids,
            "source": np.char.add(
                "src", ((ids * 2654435761) % 20).astype("U2"))})

    docs = (rd.range(n_rows, override_num_blocks=64)
            .map_batches(mk_docs, batch_format="pandas").materialize())
    t0 = time.perf_counter()
    mixed = epoch_mix(docs, "doc_id", "source", factors, "scale_ep")
    per_src = (mixed.map_batches(
        lambda df: df.groupby("source", as_index=False).size(),
        batch_format="pandas").to_pandas()
        .groupby("source")["size"].sum())
    mix_s = time.perf_counter() - t0
    base_counts = (docs.map_batches(
        lambda df: df.groupby("source", as_index=False).size(),
        batch_format="pandas").to_pandas().groupby("source")["size"].sum())
    for s_name, f in factors.items():
        nsrc = int(base_counts[s_name])
        exp = f * nsrc
        assert abs(per_src.get(s_name, 0) - exp) < 6 * np.sqrt(nsrc) + 5, (
            s_name, per_src.get(s_name, 0), exp)
    out["epoch_rows_in"] = n_rows
    out["epoch_rows_out"] = int(per_src.sum())
    out["epoch_s"] = round(mix_s, 2)
    out["epoch_rows_per_s"] = int(n_rows / mix_s)

    # --- interval_join at 8M events × 5k intervals --------------------------
    from searchengine_ray.stages.sessions import interval_join

    n_ev, n_iv = 8_000_000, 5_000
    span = 10_000_000_000

    def mk_ev(b):
        ids = b["id"].to_numpy(np.int64)
        return pd.DataFrame({
            "event_id": ids,
            "ts_us": (ids * 6364136223846793005) % span})

    evs = (rd.range(n_ev, override_num_blocks=64)
           .map_batches(mk_ev, batch_format="pandas").materialize())
    rng = np.random.RandomState(11)
    s = rng.randint(0, span, n_iv).astype(np.int64)
    dur = rng.randint(1_000_000, span // 2_000, n_iv).astype(np.int64)
    iv = pd.DataFrame({"interval_id": np.arange(n_iv, dtype=np.int64),
                       "start_us": s, "end_us": s + dur})
    # plants: 3 full-span intervals (max replication skew — every bucket)
    for j in range(3):
        iv.loc[j, ["start_us", "end_us"]] = [-1, span + 1]
    ivds = rd.from_pandas(iv).repartition(8)
    t0 = time.perf_counter()
    pairs = interval_join(evs, ivds, (0, span - 1)).materialize()
    n_pairs = pairs.count()
    join_s = time.perf_counter() - t0
    per_iv = (pairs.map_batches(
        lambda df: df.groupby("interval_id", as_index=False).size(),
        batch_format="pandas").to_pandas()
        .groupby("interval_id")["size"].sum())
    for j in range(3):  # full-span: every event matched exactly once
        assert per_iv[j] == n_ev, (j, per_iv[j])
    # sampled brute-force equality on 2k events
    samp = evs.map_batches(
        lambda df: df[df["event_id"] < 2_000], batch_format="pandas"
    ).to_pandas()
    sp = pairs.map_batches(
        lambda df: df[df["event_id"] < 2_000], batch_format="pandas"
    ).to_pandas()
    ts = samp.sort_values("event_id")["ts_us"].to_numpy()
    m = ((ts[:, None] >= iv["start_us"].to_numpy()[None, :])
         & (ts[:, None] < iv["end_us"].to_numpy()[None, :]))
    fi, ri = np.nonzero(m)
    want = set(zip(samp.sort_values("event_id")["event_id"].to_numpy()[fi]
                   .tolist(), ri.tolist()))
    assert set(zip(sp["event_id"], sp["interval_id"])) == want
    out["ivj_events"] = n_ev
    out["ivj_intervals"] = n_iv
    out["ivj_pairs"] = int(n_pairs)
    out["ivj_s"] = round(join_s, 2)
    out["ivj_pairs_per_s"] = int(n_pairs / join_s)

    # --- DSIR at 1M docs ----------------------------------------------------
    from searchengine_ray.stages.dsir import (
        dsir_log_ratio, dsir_scores, paired_bucket_counts)
    from searchengine_ray.stages.relational import global_topk

    n_docs = 1_000_000

    def mk_text(b):
        ids = b["id"].to_numpy(np.int64)
        # 1% target slice with a distinct vocabulary; 0.1% of raw docs
        # mimic it (the docs DSIR should surface); rest draw from a
        # disjoint vocab
        kind = (ids * 2654435761) % 1000
        is_t = kind < 10
        looks_t = (kind >= 10) & (kind < 11)
        w = (ids % 97).astype("U2")
        base = np.where(is_t | looks_t,
                        np.char.add("tgt", w), np.char.add("raw", w))
        nxt = np.char.add(np.where(is_t | looks_t, "tgt", "raw"),
                          ((ids + 1) % 97).astype("U2"))
        return pd.DataFrame({
            "doc_id": ids,
            "text": np.char.add(np.char.add(base, " "), nxt),
            "is_target": is_t})

    corpus = (rd.range(n_docs, override_num_blocks=64)
              .map_batches(mk_text, batch_format="pandas").materialize())
    t0 = time.perf_counter()
    t_c, q_c = paired_bucket_counts(corpus, "sc", 4096, "text", "is_target")
    counts_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    scores = dsir_scores(corpus, dsir_log_ratio(t_c, q_c), "sc")
    top = global_topk(scores, ["score", "doc_id"], [False, True], 1000)
    score_s = time.perf_counter() - t0
    kinds = (top["doc_id"].to_numpy() * 2654435761) % 1000
    assert (kinds < 11).all()  # only target/target-like docs selected
    out["dsir_docs"] = n_docs
    out["dsir_counts_s"] = round(counts_s, 2)
    out["dsir_score_s"] = round(score_s, 2)
    out["dsir_docs_per_s"] = int(n_docs / (counts_s + score_s))

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
