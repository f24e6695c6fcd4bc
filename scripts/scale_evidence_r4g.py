"""Scale evidence for the round-4 close operators (anchor texts, varint
postings codec, PMI collocations, temperature mix).

Deterministic synthetic inputs far above the sf0.1 row counts, one quiet
run; prints ONE JSON line.  Run from /root/repo:

    python scripts/scale_evidence_r4g.py

Measures:
- postings codec: encode+persist then decode at 8M (token, doc_id)
  postings over a 200k-token vocabulary — bytes/posting (the compression
  the 100-TB index layout rests on) and both throughputs, plus a
  roundtrip-exactness assert (sum/df over decoded == sum/df over input).
- anchor texts: map-side explode + ONE pre_aggregate at 2M docs (6M
  edges) — the single-exchange claim at 400× sf0.1.
- collocations: bigram+unigram pre_aggregates at 1M synthetic docs.
- temperature mix: rate derivation + map-only filter at 8M rows / 40
  strata with a planted 64:1 skew; asserts kept counts track sqrt(n_s)
  within binomial noise.
"""

from __future__ import annotations

import json
import sys
import tempfile
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

    # --- postings codec at 8M postings -----------------------------------
    n_post, vocab = 8_000_000, 200_000
    rng = np.random.default_rng(1)
    tok_ids = rng.integers(0, vocab, size=n_post, dtype=np.int64)
    doc_ids = rng.integers(0, 50_000_000, size=n_post, dtype=np.int64)
    pairs = pd.DataFrame({"token": np.char.add(
        "t", tok_ids.astype("U7")), "doc_id": doc_ids})
    pairs = pairs.drop_duplicates(["token", "doc_id"])
    ds = rd.from_pandas(pairs).repartition(64).materialize()

    from searchengine_ray.stages.postings_codec import (
        decode_summary, encode_postings)

    scratch = tempfile.mkdtemp(prefix="graft_codec_scale_")
    t0 = time.perf_counter()
    encode_postings(ds).write_parquet(scratch)
    enc_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    summ = decode_summary(rd.read_parquet(scratch)).to_pandas()
    dec_s = time.perf_counter() - t0
    want = (pairs.groupby("token")["doc_id"]
            .agg(df="count", sum_doc_id="sum"))
    got = summ.set_index("token")
    assert len(got) == len(want)
    assert int(got["df"].sum()) == len(pairs)
    assert int(got["sum_doc_id"].sum()) == int(want["sum_doc_id"].sum())
    total_bytes = int(summ["n_bytes"].sum())
    out["codec_postings"] = len(pairs)
    out["codec_encode_s"] = round(enc_s, 2)
    out["codec_decode_s"] = round(dec_s, 2)
    out["codec_bytes_per_posting"] = round(total_bytes / len(pairs), 3)
    out["codec_vs_fixed8"] = round(8 * len(pairs) / total_bytes, 2)

    # --- anchor texts at 2M docs ------------------------------------------
    from searchengine_ray.pipelines.queries import anchor_text_weights

    n_docs = 2_000_000
    vocab_a = np.array([f"w{i}" for i in range(5_000)])

    def make_docs(b):
        ids = b["id"].to_numpy(np.int64)
        texts = np.char.add(np.char.add(
            vocab_a[ids % 4999], " "), vocab_a[(ids * 7) % 4993])
        return pd.DataFrame({"doc_id": ids, "text": texts})

    docs = (rd.range(n_docs, override_num_blocks=64)
            .map_batches(make_docs, batch_format="pandas").materialize())
    t0 = time.perf_counter()
    top = anchor_text_weights(docs, n_docs, k=300)
    anchor_s = time.perf_counter() - t0
    assert len(top) == 300 and (top["w"] > 0).all()
    out["anchor_docs"] = n_docs
    out["anchor_s"] = round(anchor_s, 2)
    out["anchor_docs_per_s"] = int(n_docs / anchor_s)

    # --- collocations at 1M docs ------------------------------------------
    from searchengine_ray.stages.collocations import bigram_pmi

    n_cd = 1_000_000

    def make_cdocs(b):
        ids = b["id"].to_numpy(np.int64)
        # ~8.6k distinct pairs over 2M bigram positions → every pair well
        # above min_count, so the PMI table is dense and the top-k binds
        t = np.char.add(np.char.add(
            vocab_a[ids % 97], " "), vocab_a[(ids * 13) % 89])
        t = np.char.add(np.char.add(t, " "), vocab_a[(ids * 29) % 83])
        return pd.DataFrame({"doc_id": ids, "text": t})

    cdocs = (rd.range(n_cd, override_num_blocks=64)
             .map_batches(make_cdocs, batch_format="pandas").materialize())
    t0 = time.perf_counter()
    pmi = bigram_pmi(cdocs, min_count=5, k=100)
    colloc_s = time.perf_counter() - t0
    assert len(pmi) == 100
    out["colloc_docs"] = n_cd
    out["colloc_s"] = round(colloc_s, 2)
    out["colloc_docs_per_s"] = int(n_cd / colloc_s)

    # --- temperature mix at 8M rows / 40 strata ---------------------------
    from searchengine_ray.stages.sampling import temperature_mix

    n_rows = 8_000_000

    def make_rows(b):
        ids = b["id"].to_numpy(np.int64)
        # planted skew: stratum s gets weight ~ (s+1)^2 → 1600:1 count ratio
        s = (np.sqrt(ids % 1_600_000).astype(np.int64) // 32)
        return pd.DataFrame({"doc_id": ids,
                             "lang": np.char.add("l", s.astype("U3"))})

    rows = (rd.range(n_rows, override_num_blocks=64)
            .map_batches(make_rows, batch_format="pandas").materialize())
    t0 = time.perf_counter()
    kept = temperature_mix(rows, "doc_id", "lang", "scale")
    kept_counts = (kept.map_batches(
        lambda df: df.groupby("lang", as_index=False).size(),
        batch_format="pandas").to_pandas()
        .groupby("lang")["size"].sum())
    mix_s = time.perf_counter() - t0
    full = rows.map_batches(
        lambda df: df.groupby("lang", as_index=False).size(),
        batch_format="pandas").to_pandas().groupby("lang")["size"].sum()
    mn = int(full.min())
    for s_name in full.index:
        exp = np.sqrt(mn * full[s_name])
        assert abs(kept_counts.get(s_name, 0) - exp) < 6 * np.sqrt(exp) + 5, (
            s_name, kept_counts.get(s_name, 0), exp)
    out["mix_rows"] = n_rows
    out["mix_strata"] = int(full.size)
    out["mix_s"] = round(mix_s, 2)
    out["mix_rows_per_s"] = int(n_rows / mix_s)

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
