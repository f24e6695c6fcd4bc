"""Scale evidence for the round-4 audio/video modality operators.

Deterministic synthetic corpora (cached on disk after first build, build
time excluded), one quiet run; prints ONE JSON line.  Run from /root/repo:

    python scripts/scale_evidence_r4d.py
    GRAFT_ONLY=video GRAFT_VIDEO_N=6000 python scripts/scale_evidence_r4d.py

Sections (select with GRAFT_ONLY=a,b): video, audio.

What the numbers evidence:
- video: frame demux + real PNG decode + phash at N videos (~18 frames
  each), then the full frame-band near-dup + temporal-alignment keep-best.
  The per-frame kernel is the 100-TB cost (0.3 ms/frame single-thread);
  the shuffles are O(matched pairs), never O(frames²), and nothing on the
  driver scales with the corpus — so frames/s should hold as N grows and
  the wall should be decode-dominated, not pair-dominated.
- audio: RIFF/WAVE PCM16 decode + time-frequency fingerprint at N clips,
  then the fingerprint-band near-dup.  Same shape argument.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

ONLY = set(os.environ.get("GRAFT_ONLY", "video,audio,incdedup").split(","))
VIDEO_N = int(os.environ.get("GRAFT_VIDEO_N", "4000"))
AUDIO_N = int(os.environ.get("GRAFT_AUDIO_N", "6000"))
BASE_N = int(os.environ.get("GRAFT_BASE_N", "200000"))
DELTA_N = int(os.environ.get("GRAFT_DELTA_N", "2000"))
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

out: dict = {"metric": "scale_evidence_r4d", "num_cpus": NUM_CPUS}


def _video() -> None:
    import pandas as pd
    import ray.data as rd

    from searchengine_ray.sources.video_table import ensure_video_table
    from searchengine_ray.stages.dedup import hash_neardup_pairs
    from searchengine_ray.stages.relational import bucketed_apply, pre_aggregate
    from searchengine_ray.stages.video import SampleFramePhashes

    path = ensure_video_table(
        path=f"/tmp/graft_video_table/scale_{VIDEO_N}.parquet",
        n_videos=VIDEO_N)
    ds = rd.read_parquet(path, columns=["video_id", "bytes"])

    t0 = time.perf_counter()
    frames = ds.map_batches(SampleFramePhashes(every_n=1),
                            batch_format="pyarrow",
                            batch_size=32).materialize()
    t_decode = time.perf_counter() - t0
    n_frames = frames.count()

    def fid(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "fid": df["video_id"] + "#" + df["frame_idx"].astype(str),
            "phash": df["phash"]})

    t0 = time.perf_counter()
    pairs = hash_neardup_pairs(frames.map_batches(fid, batch_format="pandas"),
                               hash_col="phash", id_col="fid", max_hamming=4)

    def split(df: pd.DataFrame) -> pd.DataFrame:
        sa = df["id_a"].str.rsplit("#", n=1)
        sb = df["id_b"].str.rsplit("#", n=1)
        o = pd.DataFrame({"video_a": sa.str[0], "video_b": sb.str[0],
                          "best_offset": sb.str[1].astype("int64")
                          - sa.str[1].astype("int64")})
        return o[o["video_a"] != o["video_b"]]

    per_off = pre_aggregate(pairs.map_batches(split, batch_format="pandas"),
                            ["video_a", "video_b", "best_offset"],
                            {"aligned": (None, "count")})
    best = bucketed_apply(
        per_off, ["video_a", "video_b"],
        lambda g: (g.sort_values(["video_a", "video_b", "aligned",
                                  "best_offset"],
                                 ascending=[True, True, False, True],
                                 kind="mergesort")
                   .drop_duplicates(["video_a", "video_b"], keep="first")))
    n_pairs = best.map_batches(lambda d: d[d["aligned"] >= 8],
                               batch_format="pandas").count()
    t_pairs = time.perf_counter() - t0

    out["video"] = {
        "n_videos": VIDEO_N, "n_frames": n_frames,
        "decode_phash_sec": round(t_decode, 2),
        "frames_per_sec": round(n_frames / t_decode),
        "align_neardup_sec": round(t_pairs, 2),
        "aligned_pairs": n_pairs,
    }


def _audio() -> None:
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from searchengine_ray.sources.audio_table import ensure_audio_table
    from searchengine_ray.stages.audio import DecodeWav, fingerprint64
    from searchengine_ray.stages.dedup import hash_neardup_pairs

    path = ensure_audio_table(
        path=f"/tmp/graft_audio_table/scale_{AUDIO_N}.parquet",
        n_clips=AUDIO_N)
    ds = rd.read_parquet(path, columns=["audio_id", "bytes"])

    def to_fp(batch: pa.Table) -> pa.Table:
        decoded = DecodeWav()(batch)
        fps = [fingerprint64(np.frombuffer(p, dtype="<i2"))
               for p in decoded["pcm"].to_pylist()]
        return pa.table({"audio_id": decoded["audio_id"],
                         "afp": pa.array(fps, pa.int64())})

    t0 = time.perf_counter()
    sigs = ds.map_batches(to_fp, batch_format="pyarrow",
                          batch_size=128).materialize()
    t_decode = time.perf_counter() - t0
    n = sigs.count()

    t0 = time.perf_counter()
    n_pairs = hash_neardup_pairs(sigs, hash_col="afp", id_col="audio_id",
                                 max_hamming=4).count()
    t_pairs = time.perf_counter() - t0
    out["audio"] = {
        "n_clips": AUDIO_N, "rows_decoded": n,
        "decode_fp_sec": round(t_decode, 2),
        "clips_per_sec": round(n / t_decode),
        "neardup_sec": round(t_pairs, 2),
        "pairs": n_pairs,
    }


def _incdedup() -> None:
    """Incremental near-dup (persisted band store + delta signing +
    selective verify) vs FULL recompute at BASE_N + DELTA_N docs — the
    daily-increment claim measured."""
    import shutil

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from searchengine_ray.stages.dedup import (
        build_band_store, incremental_neardup_pairs,
        minhash_lsh_candidates, verify_jaccard_pairs)

    def text_of(i: int) -> str:
        r = np.random.RandomState((1_000_003 * i + 12_345) % (2**31 - 1))
        return " ".join(f"w{t}" for t in r.randint(0, 20_000, 40))

    def gen(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["id"].to_numpy(np.int64)
        texts = []
        for i in ids:
            if i >= BASE_N and i % 2 == 0:  # delta near-dup of a base doc
                texts.append(text_of(int(i * 7 % BASE_N)) + " extra tail")
            else:
                texts.append(text_of(int(i)))
        return pd.DataFrame({"doc_id": ids, "text": texts})

    total = BASE_N + DELTA_N
    # land the corpus on disk first — a real increment reads stored
    # tables, and lazy re-generation would otherwise recompute the
    # synthetic texts once per consumer in BOTH arms
    corpus_dir = f"/tmp/graft_scratch/incdedup_corpus_{BASE_N}_{DELTA_N}"
    if not os.path.isdir(corpus_dir):
        rd.range(total).repartition(8 * NUM_CPUS).map_batches(
            gen, batch_format="pandas").write_parquet(corpus_dir + ".tmp")
        os.rename(corpus_dir + ".tmp", corpus_dir)
    corpus = rd.read_parquet(corpus_dir)
    base = corpus.map_batches(lambda d: d[d["doc_id"] < BASE_N],
                              batch_format="pandas")
    delta = corpus.map_batches(lambda d: d[d["doc_id"] >= BASE_N],
                               batch_format="pandas")

    store = "/tmp/graft_scratch/scale_band_store"
    shutil.rmtree(store, ignore_errors=True)
    t0 = time.perf_counter()
    build_band_store(base, store)
    t_store = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_inc = incremental_neardup_pairs(store, base, delta,
                                      threshold=0.65).count()
    t_inc = time.perf_counter() - t0

    t0 = time.perf_counter()
    union = base.union(delta)
    n_full = verify_jaccard_pairs(
        union, minhash_lsh_candidates(union, dedup=False),
        threshold=0.65).count()
    t_full = time.perf_counter() - t0

    out["incdedup"] = {
        "base_docs": BASE_N, "delta_docs": DELTA_N,
        "store_build_sec": round(t_store, 2),
        "incremental_sec": round(t_inc, 2), "incremental_pairs": n_inc,
        "full_recompute_sec": round(t_full, 2), "full_pairs": n_full,
        "speedup": round(t_full / t_inc, 2) if t_inc else None,
    }


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    if "video" in ONLY:
        _video()
    if "audio" in ONLY:
        _audio()
    if "incdedup" in ONLY:
        _incdedup()
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
