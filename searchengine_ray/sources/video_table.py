"""Deterministic video+title corpus table (multimodal extension).

Columns ``(video_id: string, bytes: binary, w: int32, h: int32,
n_frames: int32, fps: float64, fmt: string, title: string)`` — opaque
binary payload + typed metadata, same discipline as the image and audio
tables.  Payloads are real MPNG containers
(``functions/videocontainer``): length-prefixed PNG frames, each
decodable by any standard PNG tool.

Planted ground truth:

- ~4% EXACT duplicates (byte-identical payload of an earlier video),
- ~6% NOISY near-duplicates (same frames + uniform ±2 pixel noise before
  the lossless encode — frame phashes shift a few bits),
- ~4% TEMPORAL TRIMS (an earlier video minus its last ≤⅓ frames — the
  re-cut/re-upload shape; frame-hash aggregation must still match),
- ~4% TEMPORAL CLIPS (an earlier video's tail starting at frame s ≥ 2 —
  the excerpt/re-post shape; frame matches line up at a NONZERO constant
  offset, which is what the aligned near-dup operator must recover),
- the rest independent clips (moving shapes over a gradient background).

Pure function of (n_videos, seed); canonical corpus at one versioned
path shared by the Ray pipeline and the DuckDB oracle.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from searchengine_ray.functions.videocontainer import mux_frames

N_CANONICAL = 300
SEED = 20260819
GEN_VERSION = 2
CANONICAL_PATH = (f"/tmp/graft_video_table/"
                  f"video_v{GEN_VERSION}_n{N_CANONICAL}_s{SEED}.parquet")
GOLDEN_PATH = (f"/tmp/graft_video_table/"
               f"golden_v{GEN_VERSION}_n{N_CANONICAL}_s{SEED}.parquet")

_VOCAB = ["clip", "scene", "pan", "zoom", "cut", "fade", "motion", "still",
          "bright", "dark", "fast", "slow", "loop", "intro", "outro"]

EXACT_DUP_FRAC = 0.04
NOISY_DUP_FRAC = 0.06
TRIM_DUP_FRAC = 0.04
CLIP_DUP_FRAC = 0.04
NOISE_LSB = 2


def _synth_frames(rng: np.random.RandomState) -> tuple[list[np.ndarray], float]:
    """Moving rectangles over a linear-gradient background."""
    edge = int(rng.choice([32, 48]))
    n = int(rng.randint(12, 25))
    fps = float(rng.choice([12.0, 24.0]))
    yy, xx = np.mgrid[0:edge, 0:edge].astype(np.float64) / edge
    gdir = rng.uniform(0, 2 * np.pi)
    ramp = np.cos(gdir) * xx + np.sin(gdir) * yy
    c0 = rng.randint(0, 128, 3)
    c1 = rng.randint(128, 256, 3)
    bg = (c0[None, None] + (c1 - c0)[None, None]
          * ((ramp - ramp.min()) / max(np.ptp(ramp), 1e-9))[..., None])
    rects = []
    for _ in range(rng.randint(1, 3)):
        size = rng.randint(edge // 6, edge // 3)
        pos = rng.uniform(0, edge, 2)
        vel = rng.uniform(-edge / 8, edge / 8, 2)
        color = rng.randint(0, 256, 3)
        rects.append((size, pos, vel, color))
    frames = []
    for t in range(n):
        f = bg.copy()
        for size, pos, vel, color in rects:
            y = int(pos[0] + vel[0] * t) % edge
            x = int(pos[1] + vel[1] * t) % edge
            f[y:y + size, x:x + size] = color  # clipped at the frame edge
        frames.append(np.clip(f, 0, 255).astype(np.uint8))
    return frames, fps


def _title(rng: np.random.RandomState) -> str:
    return " ".join(rng.choice(_VOCAB) for _ in range(rng.randint(3, 9)))


def build_video_table(n_videos: int, seed: int = SEED) -> pa.Table:
    return _build(n_videos, seed)[0]


def build_golden_table(n_videos: int, seed: int = SEED) -> pa.Table:
    """Pre-encode pixel ground truth: concatenated raw uint8 frames
    (n_frames × h × w × 3, row-major) per video — PNG is lossless, so the
    demux-decode pipeline must reproduce these bytes exactly."""
    return _build(n_videos, seed)[1]


def _build(n_videos: int, seed: int) -> tuple[pa.Table, pa.Table]:
    ids, blobs, ws, hs, nfs, fpss, titles = [], [], [], [], [], [], []
    raws = []
    dup_of, dup_kind, dup_offset = [], [], []
    originals: list[tuple[list[np.ndarray], float]] = []
    rng_plan = np.random.RandomState(seed)
    for i in range(n_videos):
        rng = np.random.RandomState((seed * 999983 + i) % (2**31 - 1))
        u = rng_plan.uniform()
        kind, of, off = "", -1, 0
        if i > 10 and u < EXACT_DUP_FRAC:
            j = rng_plan.randint(0, i)
            frames, fps = originals[j]
            kind, of = "exact", j
        elif i > 10 and u < EXACT_DUP_FRAC + NOISY_DUP_FRAC:
            j = rng_plan.randint(0, i)
            base, fps = originals[j]
            frames = [np.clip(f.astype(np.int16)
                              + rng.randint(-NOISE_LSB, NOISE_LSB + 1,
                                            f.shape),
                              0, 255).astype(np.uint8) for f in base]
            kind, of = "noisy", j
        elif i > 10 and u < EXACT_DUP_FRAC + NOISY_DUP_FRAC + TRIM_DUP_FRAC:
            j = rng_plan.randint(0, i)
            base, fps = originals[j]
            keep = len(base) - int(rng.randint(1, max(2, len(base) // 3)))
            frames = [f.copy() for f in base[:max(keep, 4)]]
            kind, of = "trim", j
        elif i > 10 and u < (EXACT_DUP_FRAC + NOISY_DUP_FRAC
                             + TRIM_DUP_FRAC + CLIP_DUP_FRAC):
            # tail excerpt from frame s ≥ 2: frame k of the clip equals
            # frame s+k of the base, so every cross match sits at the
            # SAME nonzero offset — the aligned operator's ground truth.
            # Every base has ≥ 12 frames, so ≥ 9 survive (> the 8-shared
            # pair threshold).
            j = rng_plan.randint(0, i)
            base, fps = originals[j]
            if len(base) < 12:  # a short derived dup — take the first
                # long-enough earlier video instead (v0 is synth, ≥ 12)
                j = next(k for k in range(i)
                         if len(originals[k][0]) >= 12)
                base, fps = originals[j]
            s = int(rng.randint(2, len(base) - 8))
            frames = [f.copy() for f in base[s:]]
            kind, of, off = "clip", j, s
        else:
            frames, fps = _synth_frames(rng)
        dup_kind.append(kind)
        dup_of.append(of)
        dup_offset.append(off)
        originals.append((frames, fps))
        h, w = frames[0].shape[:2]
        host = int(rng.randint(0, 8))
        ids.append(f"video://host{host}.example/v{i:06d}.mpng")
        blobs.append(mux_frames(frames, fps))
        ws.append(w); hs.append(h); nfs.append(len(frames)); fpss.append(fps)
        titles.append(_title(rng))
        raws.append(b"".join(f.tobytes() for f in frames))
    corpus = pa.table({
        "video_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "w": pa.array(ws, pa.int32()),
        "h": pa.array(hs, pa.int32()),
        "n_frames": pa.array(nfs, pa.int32()),
        "fps": pa.array(fpss, pa.float64()),
        "fmt": pa.array(["mpng"] * n_videos, pa.string()),
        "title": pa.array(titles, pa.string()),
    })
    golden = pa.table({
        "video_id": pa.array(ids, pa.string()),
        "w": pa.array(ws, pa.int32()),
        "h": pa.array(hs, pa.int32()),
        "n_frames": pa.array(nfs, pa.int32()),
        "fps": pa.array(fpss, pa.float64()),
        "pixels": pa.array(raws, pa.binary()),
        # planted ground truth (dup_of = source row index, -1 = original;
        # dup_offset = head frames removed, nonzero only for 'clip')
        "dup_kind": pa.array(dup_kind, pa.string()),
        "dup_of": pa.array(dup_of, pa.int32()),
        "dup_offset": pa.array(dup_offset, pa.int32()),
    })
    return corpus, golden


def _ensure(path: str, n: int, builder) -> str:
    if os.path.exists(path) and pq.read_metadata(path).num_rows == n:
        return path
    tbl = builder(n)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)
    return path


def ensure_video_table(path: str = CANONICAL_PATH,
                       n_videos: int = N_CANONICAL) -> str:
    return _ensure(path, n_videos, build_video_table)


def ensure_golden_table(path: str = GOLDEN_PATH,
                        n_videos: int = N_CANONICAL) -> str:
    return _ensure(path, n_videos, build_golden_table)
