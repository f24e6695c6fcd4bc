"""Deterministic audio+transcript corpus table (multimodal extension).

Columns ``(audio_id: string, bytes: binary, sr: int32, n_samples: int32,
fmt: string, transcript: string)`` — the audio analog of the
BASELINE.json image input_hint shape: an opaque binary payload column
plus typed metadata.  Payloads are REAL RIFF/WAVE PCM16 files
(``functions/audiocodec``), decodable by any standard tool.

Planted ground truth, mirroring ``sources/image_table``:

- ~4% EXACT duplicates (byte-identical payload of an earlier clip),
- ~6% NEAR duplicates (same waveform + uniform ±2-LSB noise — inaudible,
  fingerprint-hamming-close but byte-distinct),
- the rest independent multi-sine clips (distinct fingerprints).

Everything is a pure function of (n_clips, seed): no wall clock, no
global RNG.  The canonical corpus lives at ONE versioned path so the Ray
pipeline and the DuckDB oracle read the same file; bench sizes a larger
corpus via ``n_clips``.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from searchengine_ray.functions.audiocodec import encode_wav

N_CANONICAL = 500
SEED = 20260818
# bump when the generator changes — baked into the canonical filename so a
# stale corpus from an older revision can never silently feed the pipeline
# or the oracle (same discipline as sources/image_table.GEN_VERSION)
GEN_VERSION = 1
CANONICAL_PATH = (f"/tmp/graft_audio_table/"
                  f"audio_v{GEN_VERSION}_n{N_CANONICAL}_s{SEED}.parquet")
GOLDEN_PATH = (f"/tmp/graft_audio_table/"
               f"golden_v{GEN_VERSION}_n{N_CANONICAL}_s{SEED}.parquet")

_VOCAB = [
    "signal", "window", "frame", "energy", "band", "noise", "tone",
    "sample", "rate", "clip", "speech", "music", "quiet", "loud",
    "rising", "falling", "steady", "pulse", "echo", "fade",
]

EXACT_DUP_FRAC = 0.04
NEAR_DUP_FRAC = 0.06
NOISE_LSB = 2  # ±2 LSB uniform noise on near-dups


def _synth_clip(rng: np.random.RandomState) -> tuple[np.ndarray, int]:
    """One clip as a sequence of 'notes' (speech/music-like): each note a
    short span of 1-3 sinusoids at its own frequencies and amplitude.
    Time-varying spectral content is what makes audio fingerprints
    clip-distinctive — a stationary tone fingerprints near-degenerately."""
    sr = int(rng.choice([8000, 16000]))
    dur = float(rng.uniform(0.4, 1.2))
    n = int(sr * dur)
    x = np.zeros(n)
    pos = 0
    while pos < n:
        span = min(n - pos, int(sr * rng.uniform(0.05, 0.2)))
        t = np.arange(span) / sr
        note = np.zeros(span)
        for _ in range(rng.randint(1, 4)):
            f = rng.uniform(100.0, 3500.0)
            note += rng.uniform(0.2, 1.0) * np.sin(
                2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
        # attack/decay ramp so note boundaries are smooth
        ramp = min(span // 4, 64)
        if ramp > 0:
            note[:ramp] *= np.linspace(0, 1, ramp)
            note[-ramp:] *= np.linspace(1, 0, ramp)
        x[pos:pos + span] = rng.uniform(0.25, 1.0) * note
        pos += span
    x *= 0.45 * 32767.0 / max(np.abs(x).max(), 1e-9)
    return x.astype(np.int16), sr


def _transcript(rng: np.random.RandomState) -> str:
    k = rng.randint(6, 20)
    return " ".join(rng.choice(_VOCAB) for _ in range(k))


def build_audio_table(n_clips: int, seed: int = SEED) -> pa.Table:
    """Materialize the corpus AND its golden (pre-encode samples) table.

    Returns only the corpus table; ``build_golden_table`` re-derives the
    golden rows from the same (n, seed) so the two always align."""
    return _build(n_clips, seed)[0]


def build_golden_table(n_clips: int, seed: int = SEED) -> pa.Table:
    """Generator ground truth: the exact int16 samples each payload
    encodes (PCM16 is lossless — decode must match BYTE-EXACTLY)."""
    return _build(n_clips, seed)[1]


def _build(n_clips: int, seed: int) -> tuple[pa.Table, pa.Table]:
    ids, blobs, srs, lens, transcripts = [], [], [], [], []
    goldens = []
    originals: list[tuple[np.ndarray, int]] = []
    rng_plan = np.random.RandomState(seed)
    for i in range(n_clips):
        rng = np.random.RandomState((seed * 1000003 + i) % (2**31 - 1))
        u = rng_plan.uniform()
        if i > 10 and u < EXACT_DUP_FRAC:
            j = rng_plan.randint(0, i)
            samples, sr = originals[j]
        elif i > 10 and u < EXACT_DUP_FRAC + NEAR_DUP_FRAC:
            j = rng_plan.randint(0, i)
            base, sr = originals[j]
            noise = rng.randint(-NOISE_LSB, NOISE_LSB + 1, size=base.shape)
            samples = np.clip(base.astype(np.int32) + noise,
                              -32768, 32767).astype(np.int16)
        else:
            samples, sr = _synth_clip(rng)
        originals.append((samples, sr))
        host = int(rng.randint(0, 8))
        ids.append(f"audio://host{host}.example/clip{i:06d}.wav")
        blobs.append(encode_wav(samples, sr))
        srs.append(sr)
        lens.append(len(samples))
        transcripts.append(_transcript(rng))
        goldens.append(samples.tobytes())
    corpus = pa.table({
        "audio_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "sr": pa.array(srs, pa.int32()),
        "n_samples": pa.array(lens, pa.int32()),
        "fmt": pa.array(["wav"] * n_clips, pa.string()),
        "transcript": pa.array(transcripts, pa.string()),
    })
    golden = pa.table({
        "audio_id": pa.array(ids, pa.string()),
        "sr": pa.array(srs, pa.int32()),
        # little-endian int16 frames — the pre-encode samples
        "samples": pa.array(goldens, pa.binary()),
    })
    return corpus, golden


def _ensure(path: str, n_clips: int, builder) -> str:
    if os.path.exists(path) and pq.read_metadata(path).num_rows == n_clips:
        return path
    tbl = builder(n_clips)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)
    return path


def ensure_audio_table(path: str = CANONICAL_PATH,
                       n_clips: int = N_CANONICAL) -> str:
    """Idempotent + atomic (tmp + rename) — Ray query and DuckDB oracle
    can race safely; explicit paths re-validate row count."""
    return _ensure(path, n_clips, build_audio_table)


def ensure_golden_table(path: str = GOLDEN_PATH,
                        n_clips: int = N_CANONICAL) -> str:
    return _ensure(path, n_clips, build_golden_table)
