"""Video modality: MPNG container round-trips, frame-level near-dup
detection of planted duplicates (exact / noisy / temporal trim / tail
clip), temporal-alignment offset recovery, validate stage invariants —
plus the NUL-key hash-determinism regression the video work uncovered in
the co-shuffle machinery."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from searchengine_ray.functions.videocontainer import (
    VideoFormatError, demux_frames, demux_info, mux_frames)


def _frames(n=6, edge=16, seed=3):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, (edge, edge, 3), dtype=np.uint8)
            for _ in range(n)]


def test_mpng_round_trip():
    from searchengine_ray.functions.imagecodec import decode_png

    frames = _frames()
    blob = mux_frames(frames, 24.0)
    w, h, n, fps = demux_info(blob)
    assert (w, h, n, fps) == (16, 16, 6, 24.0)
    out = demux_frames(blob)
    assert [i for i, _ in out] == list(range(6))
    for (_, png), f in zip(out, frames):
        assert np.array_equal(decode_png(png), f)


def test_mpng_stride_sampling_skips_without_decode():
    frames = _frames(n=10)
    blob = mux_frames(frames, 12.0)
    out = demux_frames(blob, every_n=3)
    assert [i for i, _ in out] == [0, 3, 6, 9]


def test_mpng_rejects_malformed():
    with pytest.raises(VideoFormatError):
        demux_info(b"nope")
    blob = mux_frames(_frames(n=3), 12.0)
    with pytest.raises(VideoFormatError):
        demux_frames(blob[:-10])  # truncated final frame
    with pytest.raises(VideoFormatError):
        mux_frames([], 12.0)
    with pytest.raises(VideoFormatError):
        mux_frames([np.zeros((4, 4, 3), np.uint8),
                    np.zeros((5, 5, 3), np.uint8)], 12.0)


def _planted(golden):
    """(base_id, dup_id, kind, offset) per planted dup, from the golden
    ground-truth columns."""
    ids = golden["video_id"].to_pylist()
    out = []
    for i, (kind, of, off) in enumerate(zip(golden["dup_kind"].to_pylist(),
                                            golden["dup_of"].to_pylist(),
                                            golden["dup_offset"].to_pylist())):
        if kind:
            out.append((ids[of], ids[i], kind, off))
    return out


def test_video_neardup_detects_all_planted(ray_session):
    """Every planted pair (exact, ±2-noise re-encode, temporal trim,
    tail clip) must appear in the frame-match output — including the
    trims a single per-video signature was measured to miss."""
    from searchengine_ray.pipelines.queries import q_video_neardup
    from searchengine_ray.sources.video_table import N_CANONICAL, SEED, _build

    _, golden = _build(N_CANONICAL, SEED)
    planted = {(min(a, b), max(a, b)) for a, b, _, _ in _planted(golden)}
    assert len(planted) >= 10

    got = q_video_neardup("unused").to_pandas()
    got_pairs = set(zip(got["video_a"], got["video_b"]))
    missing = planted - got_pairs
    assert not missing, f"planted pairs missed: {sorted(missing)[:5]}"


def test_video_aligned_neardup_recovers_clip_offsets(ray_session):
    """The temporal-alignment operator must recover each planted tail
    clip at its TRUE offset: base frame s+k equals clip frame k, and
    ids ascend with build order, so with a = base (smaller id) the best
    offset is idx_clip − idx_base = −s.  Exact/noisy/trim dups align at
    offset 0 (every surviving frame matches its own index, which no
    other single offset can beat)."""
    from searchengine_ray.pipelines.queries import q_video_aligned_neardup
    from searchengine_ray.sources.video_table import N_CANONICAL, SEED, _build

    _, golden = _build(N_CANONICAL, SEED)
    clips = [(a, b, off) for a, b, kind, off in _planted(golden)
             if kind == "clip"]
    assert len(clips) >= 3, "corpus must plant enough clips to test"

    got = q_video_aligned_neardup("unused").to_pandas()
    best = {(r.video_a, r.video_b): (r.best_offset, r.aligned)
            for r in got.itertuples()}
    for base_id, clip_id, s in clips:
        key = (min(base_id, clip_id), max(base_id, clip_id))
        assert key in best, f"clip pair missing: {key}"
        off, aligned = best[key]
        expect = -s if base_id < clip_id else s
        assert off == expect, (key, off, expect)
        assert aligned >= 8
    # zero-offset families still align at 0
    zeros = [(a, b) for a, b, kind, _ in _planted(golden) if kind == "exact"]
    for a, b in zeros:
        key = (min(a, b), max(a, b))
        if key in best:
            assert best[key][0] == 0, (key, best[key])


def test_video_pipeline_invariants(ray_session):
    from searchengine_ray.pipelines.queries import q_video_pipeline
    from searchengine_ray.sources.video_table import N_CANONICAL

    df = q_video_pipeline("unused").to_pandas()
    assert len(df) == N_CANONICAL
    assert df["decode_ok"].all() and df["pixels_exact"].all()
    assert df["meta_match"].all()


def test_bucketed_apply_nul_key_determinism(ray_session):
    """Regression: pandas hash_pandas_object(categorize=True) hashes
    NUL-containing strings differently per frame (the categorize path
    siphashes full bytes, the direct path stops at NUL), so the same key
    could land in different buckets depending on block composition —
    duplicate rows then survive a bucketed dedup.  categorize=False in
    `_hash_bucket` (and every key-hash site) pins one consistent value."""
    from searchengine_ray.stages.relational import _hash_bucket, bucketed_apply

    df = pd.DataFrame({
        "id_a": ["a\x001", "a\x001", "a\x002", "a\x002", "b\x001"],
        "id_b": ["x", "x", "y", "y", "z"],
        "v": [1, 2, 3, 4, 5],
    })
    # the hash itself must not depend on which block a row sits in
    whole = _hash_bucket(df, ["id_a", "id_b"], 64).tolist()
    parts = (_hash_bucket(df.iloc[:2].reset_index(drop=True),
                          ["id_a", "id_b"], 64).tolist()
             + _hash_bucket(df.iloc[2:].reset_index(drop=True),
                            ["id_a", "id_b"], 64).tolist())
    assert whole == parts
    # and the co-shuffled dedup must collapse equal keys across blocks
    ds = rd.from_pandas(df).repartition(3)
    out = bucketed_apply(ds, ["id_a", "id_b"],
                         lambda g: g.drop_duplicates(["id_a", "id_b"]))
    got = out.to_pandas()
    assert len(got) == 3
    assert sorted(zip(got["id_a"], got["id_b"])) == [
        ("a\x001", "x"), ("a\x002", "y"), ("b\x001", "z")]
