"""Pure-Python image codecs for the image+caption payload table.

The graft's payload rows are ``(image_id, bytes, w, h, fmt, caption, phash)``
(BASELINE.json:input_hint).  No image library (PIL/opencv) ships in this
environment, so this module provides:

- a REAL, spec-conformant PNG encoder/decoder (stdlib ``zlib`` + ``struct``)
  for ``fmt='png'`` — lossless round-trip, 8-bit RGB, filter types 0-4
  supported on decode;
- a DETERMINISTIC FAKE lossy codec for ``fmt='jpeg'`` — STUB standing in for
  a real JPEG codec: quantizes each channel to step ``Q=4`` and deflates.
  Quantization error ≤ Q/2 ⇒ PSNR ≈ 46 dB ≥ the 40 dB per-row invariant
  (BASELINE.json:input_hint).  The container tag is ``FJPG`` so the bytes can
  never be mistaken for real JPEG.  Swap ``encode_jpeg``/``decode_jpeg`` for
  a real codec when PIL is available; every caller goes through
  ``encode``/``decode`` below.

All functions operate on ``numpy.uint8`` arrays of shape (h, w, 3).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
FAKE_JPEG_MAGIC = b"FJPG"
_JPEG_Q = 4  # quantization step of the fake lossy codec


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """8-bit RGB PNG, filter type 0 per scanline, single IDAT."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters (types 0-4)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    rows = raw.reshape(h, 1 + stride)
    for y in range(h):
        ft = rows[y, 0]
        line = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ft == 0:
            out[y] = line
        elif ft == 2:  # Up
            out[y] = (line + prev) & 0xFF
        else:  # Sub(1) / Average(3) / Paeth(4) need left-to-right recurrence
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ft == 1:
                    cur[x] = (line[x] + a) & 0xFF
                elif ft == 3:
                    cur[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                elif ft == 4:
                    cc = prev[x - bpp] if x >= bpp else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                    cur[x] = (line[x] + pred) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter type {ft}")
            out[y] = cur
    return out


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 2:
                raise NotImplementedError("only 8-bit RGB PNG supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    return _unfilter(raw, h, w * 3, 3).reshape(h, w, 3)


def encode_jpeg(pixels: np.ndarray) -> bytes:
    """Deterministic FAKE lossy codec (see module docstring)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    q = np.minimum((pixels.astype(np.uint16) + _JPEG_Q // 2) // _JPEG_Q, 255 // _JPEG_Q)
    return (
        FAKE_JPEG_MAGIC
        + struct.pack(">IIB", w, h, _JPEG_Q)
        + zlib.compress(q.astype(np.uint8).tobytes(), 6)
    )


def decode_jpeg(data: bytes) -> np.ndarray:
    if data[:4] != FAKE_JPEG_MAGIC:
        raise ValueError("not a FJPG payload")
    w, h, q = struct.unpack(">IIB", data[4:13])
    arr = np.frombuffer(zlib.decompress(data[13:]), dtype=np.uint8)
    return np.minimum(arr.astype(np.uint16) * q, 255).astype(np.uint8).reshape(h, w, 3)


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "jpeg":
        return encode_jpeg(pixels)
    raise NotImplementedError(f"fmt={fmt!r}")


def decode(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        return decode_jpeg(data)
    raise NotImplementedError(f"fmt={fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
