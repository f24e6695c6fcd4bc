"""Varint codec kernels: bit-exactness vs a per-value Python reference,
boundary widths, truncation errors, segmented delta roundtrip."""

import numpy as np
import pytest

from searchengine_ray.functions.varint import (
    decode_stream, delta_encode, encode_stream, segmented_cumsum,
    varint_lengths)


def _ref_encode(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


BOUNDARIES = [0, 1, 127, 128, 16383, 16384, 2097151, 2097152,
              2**28 - 1, 2**28, 2**35, 2**42, 2**49, 2**56 - 1, 2**56,
              2**62, 2**63 - 1]


def test_encode_matches_python_reference():
    vals = np.array(BOUNDARIES, dtype=np.int64)
    buf, nb = encode_stream(vals)
    ref = b"".join(_ref_encode(int(v)) for v in vals)
    assert buf.tobytes() == ref
    assert nb.tolist() == [len(_ref_encode(int(v))) for v in vals]
    assert varint_lengths(vals).tolist() == nb.tolist()


def test_roundtrip_randomized():
    rng = np.random.default_rng(7)
    for scale_bits in (7, 20, 40, 62):
        vals = rng.integers(0, 1 << scale_bits, size=5000, dtype=np.int64)
        buf, nb = encode_stream(vals)
        assert int(nb.sum()) == buf.size
        out = decode_stream(buf)
        np.testing.assert_array_equal(out, vals)


def test_empty_and_single():
    buf, nb = encode_stream(np.empty(0, dtype=np.int64))
    assert buf.size == 0 and nb.size == 0
    assert decode_stream(buf).size == 0
    buf, _ = encode_stream(np.array([0], dtype=np.int64))
    assert buf.tobytes() == b"\x00"
    assert decode_stream(buf).tolist() == [0]


def test_truncated_stream_raises():
    buf, _ = encode_stream(np.array([300], dtype=np.int64))
    with pytest.raises(ValueError, match="truncated"):
        decode_stream(buf[:-1])


def test_negative_raises():
    with pytest.raises(ValueError, match="non-negative"):
        encode_stream(np.array([-1], dtype=np.int64))


def test_overlong_value_raises():
    bad = np.array([0x80] * 10 + [0x01], dtype=np.uint8)
    with pytest.raises(ValueError, match="9 bytes"):
        decode_stream(bad)


def test_segmented_delta_roundtrip():
    rng = np.random.default_rng(11)
    # 40 segments of sorted non-negative ids (duplicates allowed -> gap 0)
    segs = [np.sort(rng.integers(0, 1 << 45, size=rng.integers(1, 60)))
            for _ in range(40)]
    vals = np.concatenate(segs).astype(np.int64)
    counts = np.array([len(s) for s in segs], dtype=np.int64)
    starts = np.cumsum(counts) - counts
    gaps = delta_encode(vals, starts)
    # heads are absolute, in-segment gaps are diffs
    np.testing.assert_array_equal(gaps[starts], vals[starts])
    buf, nb = encode_stream(gaps)
    back = segmented_cumsum(decode_stream(buf), starts, counts)
    np.testing.assert_array_equal(back, vals)
    # per-segment blob byte counts slice the stream consistently
    seg_bytes = np.add.reduceat(nb, starts)
    assert int(seg_bytes.sum()) == buf.size


def test_compression_beats_fixed_width_on_dense_ids():
    # dense doc-id gaps (mostly < 128) must pack ~1 byte/posting vs 8
    vals = np.sort(np.random.default_rng(3).choice(
        np.arange(200_000, dtype=np.int64), size=50_000, replace=False))
    gaps = delta_encode(vals, np.array([0]))
    buf, _ = encode_stream(gaps)
    assert buf.size < vals.size * 2  # ≥4x better than 8-byte fixed
