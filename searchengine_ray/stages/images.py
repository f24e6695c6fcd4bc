"""Multimodal batch stages over opaque binary payload columns.

The payload table carries images as ``bytes: binary`` with typed metadata
``(w, h, fmt)`` (BASELINE.json:input_hint).  Each stage is an actor-pool
``map_batches`` callable: per-actor setup in ``__init__``, vectorized work
per batch, Arrow in/out so the binary buffers never round-trip through
pandas object dtype.

- ``DecodeImages``: bytes → decoded pixel tensors (via the pure-Python
  codec; swap PIL in `functions/imagecodec` when available).
- ``ResizeImages``: deterministic area resample to a target edge,
  re-encoded to the requested format.
- ``ImageFeatures``: small numeric feature vector per image (mean/std per
  channel, edge energy, phash) — the feature-extract stage shape for a
  training-data pipeline.
- ``DecodeAudio`` / ``SampleVideoFrames``: generic-codec STUBS for
  formats with no decoder in this environment (mp3/opus/h264...).  The
  Ray-side plumbing (schema contract, actor signature, batch layout,
  metadata passthrough) is real and tested; the decode kernel raises
  ``NotImplementedError`` unless ``fake_decode=True`` supplies the
  deterministic fake used in tests.  WAV/PCM16 audio has a REAL path:
  ``stages/audio.DecodeWav`` over ``functions/audiocodec``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from searchengine_ray.functions.imagecodec import decode, encode
from searchengine_ray.functions.phash import phash64


class DecodeImages:
    """(bytes, fmt) → fixed-size float32 pixel tensors + validity mask.

    Output adds ``pixels: list<float>`` (flattened h×w×3, row-major) —
    tensors stay Arrow-native; decode errors yield ``decode_ok=False``
    rows instead of failing the batch (reference behavior: malformed docs
    are dropped, index_construction.py:87-88)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        pixels, ok = [], []
        for blob, fmt in zip(blobs, fmts):
            try:
                px = decode(blob, fmt)
                pixels.append(px.astype(np.float32).ravel().tolist())
                ok.append(True)
            except Exception:
                pixels.append([])
                ok.append(False)
        return (batch.append_column("pixels", pa.array(pixels, pa.list_(pa.float32())))
                .append_column("decode_ok", pa.array(ok, pa.bool_())))


class ResizeImages:
    """Deterministic resample of every image to ``edge×edge``; re-encodes
    with the row's own ``fmt`` and refreshes (bytes, w, h, phash)."""

    def __init__(self, edge: int = 32):
        self.edge = edge

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        out_bytes, out_ph = [], []
        e = self.edge
        for blob, fmt in zip(blobs, fmts):
            px = decode(blob, fmt)
            h, w = px.shape[:2]
            ys = (np.arange(e) * h) // e
            xs = (np.arange(e) * w) // e
            small = px[np.ix_(ys, xs)]
            data = encode(small, fmt)
            out_bytes.append(data)
            out_ph.append(phash64(decode(data, fmt)))
        n = batch.num_rows
        cols = {name: batch[name] for name in batch.column_names}
        cols["bytes"] = pa.array(out_bytes, pa.binary())
        cols["w"] = pa.array([e] * n, pa.int32())
        cols["h"] = pa.array([e] * n, pa.int32())
        cols["phash"] = pa.array(out_ph, pa.int64())
        return pa.table(cols)


class ImageFeatures:
    """Per-image numeric features: channel means/stds, gradient (edge)
    energy, recomputed phash."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        feats, phs = [], []
        for blob, fmt in zip(blobs, fmts):
            px = decode(blob, fmt).astype(np.float64)
            gray = px @ np.array([0.299, 0.587, 0.114])
            gx = np.abs(np.diff(gray, axis=1)).mean() if gray.shape[1] > 1 else 0.0
            gy = np.abs(np.diff(gray, axis=0)).mean() if gray.shape[0] > 1 else 0.0
            feats.append(
                px.mean(axis=(0, 1)).tolist() + px.std(axis=(0, 1)).tolist()
                + [float(gx), float(gy)]
            )
            phs.append(phash64(px.astype(np.uint8)))
        return (batch.append_column("features", pa.array(feats, pa.list_(pa.float64())))
                .append_column("phash_recomputed", pa.array(phs, pa.int64())))


class ValidateImages:
    """Per-row INVARIANT gate vs generator ground truth (the input-hint
    contract): decoded pixels must equal the original exactly for lossless
    formats and reach PSNR ≥ ``min_psnr_db`` for lossy ones; the caption
    must match exactly.  Emits (w0, h0, decode_ok, pixels_ok, caption_ok)
    alongside the input columns.

    Actor-pool shape: the golden table loads ONCE per actor in
    ``__init__``.  At test scale it is a per-actor dict; at 100 TB the
    same comparison runs as a co-shuffled join on image_id instead of a
    replica (the validate kernel is unchanged)."""

    LOSSLESS = {"png"}

    def __init__(self, golden_path: str, min_psnr_db: float = 40.0):
        import pyarrow.parquet as pq

        self.min_psnr = min_psnr_db
        t = pq.read_table(golden_path)
        self.golden = {
            i: (p, w, h, c)
            for i, p, w, h, c in zip(t["image_id"].to_pylist(),
                                     t["pixels"].to_pylist(),
                                     t["w"].to_pylist(), t["h"].to_pylist(),
                                     t["caption"].to_pylist())
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        caps = batch["caption"].to_pylist()
        d_ok, p_ok, c_ok, w0, h0 = [], [], [], [], []
        for i, blob, fmt, cap in zip(ids, blobs, fmts, caps):
            raw, w, h, gold_cap = self.golden[i]
            w0.append(w)
            h0.append(h)
            c_ok.append(cap == gold_cap)
            orig = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
            try:
                px = decode(blob, fmt)
                d_ok.append(px.shape == orig.shape)
            except Exception:
                d_ok.append(False)
                p_ok.append(False)
                continue
            if px.shape != orig.shape:
                p_ok.append(False)
            elif fmt in self.LOSSLESS:
                p_ok.append(bool(np.array_equal(px, orig)))
            else:
                mse = float(np.mean((px.astype(np.float64)
                                     - orig.astype(np.float64)) ** 2))
                psnr = float("inf") if mse == 0 else \
                    10.0 * np.log10(255.0 ** 2 / mse)
                p_ok.append(psnr >= self.min_psnr)
        return (batch
                .append_column("w0", pa.array(w0, pa.int32()))
                .append_column("h0", pa.array(h0, pa.int32()))
                .append_column("decode_ok", pa.array(d_ok, pa.bool_()))
                .append_column("pixels_ok", pa.array(p_ok, pa.bool_()))
                .append_column("caption_ok", pa.array(c_ok, pa.bool_())))


class DecodeAudio:
    """STUB audio decode stage (no audio codec in this environment).

    Contract: input columns (bytes: binary, sample_rate: int32,
    codec: string); output appends ``samples: list<float>`` and
    ``n_samples: int64``.  With ``fake_decode=True`` the stage emits a
    deterministic sine baked from the payload hash — the plumbing path
    used by tests; otherwise it raises NotImplementedError."""

    def __init__(self, fake_decode: bool = False):
        self.fake_decode = fake_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake_decode:
            raise NotImplementedError(
                "no audio codec available in this environment; "
                "construct DecodeAudio(fake_decode=True) for the "
                "deterministic test stub or plug a real codec here"
            )
        blobs = batch["bytes"].to_pylist()
        rates = batch["sample_rate"].to_pylist()
        out = []
        for blob, rate in zip(blobs, rates):
            seed = int.from_bytes(blob[:8].ljust(8, b"\0"), "big") % (2**31 - 1)
            t = np.arange(min(rate, 1024)) / max(rate, 1)
            out.append(np.sin(2 * np.pi * (220 + seed % 440) * t).astype(np.float32).tolist())
        return (batch.append_column("samples", pa.array(out, pa.list_(pa.float32())))
                .append_column("n_samples", pa.array([len(s) for s in out], pa.int64())))


class SampleVideoFrames:
    """STUB video frame-sampling stage (no video codec in this env).

    Contract: input (bytes: binary, n_frames: int32, fps: float64);
    output explodes one row per sampled frame with ``frame_idx: int32``
    and ``frame: binary`` (encoded like an image payload).  Deterministic
    stride sampling; fake decode synthesizes frames from the payload hash.
    """

    def __init__(self, every_n: int = 10, fake_decode: bool = False):
        self.every_n = every_n
        self.fake_decode = fake_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake_decode:
            raise NotImplementedError(
                "no video codec available; use fake_decode=True for the "
                "deterministic test stub or plug a real codec here"
            )
        ids = batch["video_id"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        counts = batch["n_frames"].to_pylist()
        o_id, o_idx, o_frame = [], [], []
        for vid, blob, n in zip(ids, blobs, counts):
            seed = int.from_bytes(blob[:8].ljust(8, b"\0"), "big")
            for idx in range(0, int(n), self.every_n):
                rng = np.random.RandomState((seed + idx) % (2**31 - 1))
                px = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
                o_id.append(vid)
                o_idx.append(idx)
                o_frame.append(encode(px, "png"))
        return pa.table({
            "video_id": pa.array(o_id, pa.string()),
            "frame_idx": pa.array(o_idx, pa.int32()),
            "frame": pa.array(o_frame, pa.binary()),
        })
