"""Audio modality: RIFF/WAVE codec round-trips, fingerprint separation on
planted duplicates, decode/validate/feature stage plumbing, and the banded
near-dup operator vs the brute-force all-pairs oracle."""

import struct

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from searchengine_ray.functions.audiocodec import (
    WavFormatError, decode_wav, encode_wav)
from searchengine_ray.stages.audio import fingerprint64


def _sine(n=4000, sr=8000, f=440.0, amp=12000):
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * f * t)).astype(np.int16)


def test_wav_round_trip_mono():
    x = _sine()
    y, sr = decode_wav(encode_wav(x, 8000))
    assert sr == 8000
    assert np.array_equal(x, y)


def test_wav_round_trip_stereo():
    x = np.stack([_sine(f=440), _sine(f=880)], axis=1)
    y, sr = decode_wav(encode_wav(x, 16000))
    assert sr == 16000 and y.shape == x.shape
    assert np.array_equal(x, y)


def test_wav_decoder_walks_extra_chunks():
    x = _sine()
    b = encode_wav(x, 8000)
    # splice a LIST chunk (odd size → word-aligned pad) between fmt and data
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\0"
    blob = b[:36] + extra + b[36:]
    blob = b"RIFF" + struct.pack("<I", len(blob) - 8) + blob[8:]
    y, sr = decode_wav(blob)
    assert np.array_equal(x, y)


def test_wav_rejects_malformed():
    with pytest.raises(WavFormatError):
        decode_wav(b"not a wav at all")
    # float32 format tag
    x = _sine()
    b = bytearray(encode_wav(x, 8000))
    struct.pack_into("<H", b, 20, 3)  # fmt tag IEEE float
    with pytest.raises(WavFormatError):
        decode_wav(bytes(b))
    with pytest.raises(WavFormatError):
        encode_wav(_sine().astype(np.float32), 8000)


def _planted_layout(n, seed):
    """Re-derive the generator's planting plan (exact + near dup pairs)."""
    from searchengine_ray.sources import audio_table as at

    rng_plan = np.random.RandomState(seed)
    exact, near = [], []
    for i in range(n):
        u = rng_plan.uniform()
        if i > 10 and u < at.EXACT_DUP_FRAC:
            exact.append((int(rng_plan.randint(0, i)), i))
        elif i > 10 and u < at.EXACT_DUP_FRAC + at.NEAR_DUP_FRAC:
            near.append((int(rng_plan.randint(0, i)), i))
    return exact, near


def test_fingerprint_separation_on_planted_corpus():
    """Exact dups → hamming 0; ±2-LSB near-dups ≤ 2; independent clips
    (excluding transitive dup chains) ≥ 12."""
    from searchengine_ray.sources.audio_table import SEED, _build

    n = 200
    _, golden = _build(n, SEED)
    sams = [np.frombuffer(golden["samples"][i].as_py(), dtype="<i2")
            for i in range(n)]
    fps = np.array([fingerprint64(s) for s in sams],
                   dtype=np.int64).view(np.uint64)
    exact, near = _planted_layout(n, SEED)
    assert len(exact) >= 2 and len(near) >= 4

    def ham(a, b):
        return bin(int(fps[a] ^ fps[b])).count("1")

    assert all(ham(a, b) == 0 for a, b in exact)
    assert all(ham(a, b) <= 2 for a, b in near)
    # background: every pair not connected through the dup-chain closure
    planted = set(map(tuple, exact + near))
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in planted:
        parent[find(a)] = find(b)
    background = [ham(a, b) for a in range(n) for b in range(a + 1, n)
                  if find(a) != find(b)]
    assert min(background) >= 12


def test_decode_stage_flags_malformed(ray_session):
    from searchengine_ray.stages.audio import DecodeWav

    good = encode_wav(_sine(), 8000)
    batch = pa.table({
        "audio_id": pa.array(["a", "b"], pa.string()),
        "bytes": pa.array([good, b"garbage"], pa.binary()),
    })
    out = DecodeWav()(batch)
    assert out["decode_ok"].to_pylist() == [True, False]
    assert out["decoded_sr"].to_pylist() == [8000, 0]
    pcm = out["pcm"].to_pylist()
    assert np.array_equal(np.frombuffer(pcm[0], dtype="<i2"), _sine())


def test_audio_pipeline_invariants(ray_session):
    """Every per-row flag over the canonical corpus must be TRUE — PCM16
    decode is byte-exact vs the generator golden samples."""
    from searchengine_ray.pipelines.queries import q_audio_pipeline

    df = q_audio_pipeline("unused").to_pandas()
    from searchengine_ray.sources.audio_table import N_CANONICAL

    assert len(df) == N_CANONICAL
    assert df["decode_ok"].all() and df["pcm_exact"].all()
    assert df["sr_match"].all()
    assert np.allclose(df["duration_s"],
                       df["n_samples"].astype(float) / df["sr"])


def test_audio_features_kernels(ray_session):
    from searchengine_ray.stages.audio import AudioFeatures, DecodeWav

    sr, f = 8000, 500.0
    x = _sine(n=8000, sr=sr, f=f)
    batch = pa.table({"audio_id": pa.array(["a"], pa.string()),
                      "bytes": pa.array([encode_wav(x, sr)], pa.binary())})
    out = AudioFeatures()(DecodeWav()(batch))
    assert abs(out["duration_s"][0].as_py() - 1.0) < 1e-9
    # pure sine: rms = amp/√2 (normalized), zcr = 2f/sr, centroid ≈ f
    assert abs(out["rms"][0].as_py() - (12000 / 32768) / np.sqrt(2)) < 1e-3
    assert abs(out["zcr"][0].as_py() - 2 * f / sr) < 0.01
    assert abs(out["spectral_centroid_hz"][0].as_py() - f) < 25.0


def test_audio_neardup_matches_bruteforce(ray_session):
    """Banded pairs over the fingerprint column ≡ all-pairs hamming ≤ 4
    (pigeonhole recall is exact by construction; this pins the plumbing)."""
    from searchengine_ray.sources.audio_table import SEED, _build
    from searchengine_ray.stages.dedup import hash_neardup_pairs

    n = 150
    _, golden = _build(n, SEED)
    fps = [fingerprint64(np.frombuffer(golden["samples"][i].as_py(),
                                       dtype="<i2")) for i in range(n)]
    ids = [f"c{i:04d}" for i in range(n)]
    mask = (1 << 64) - 1
    want = sorted(
        (ids[a], ids[b])
        for a in range(n) for b in range(a + 1, n)
        if bin((fps[a] & mask) ^ (fps[b] & mask)).count("1") <= 4)
    assert len(want) >= 5  # the plants make this non-vacuous

    ds = rd.from_arrow(pa.table({
        "audio_id": pa.array(ids, pa.string()),
        "afp": pa.array(fps, pa.int64()),
    })).repartition(4)
    got = hash_neardup_pairs(ds, hash_col="afp", id_col="audio_id",
                             max_hamming=4).to_pandas()
    got_pairs = sorted(zip(got["id_a"], got["id_b"]))
    assert got_pairs == want
