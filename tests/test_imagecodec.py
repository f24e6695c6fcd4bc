"""Image codec round-trip + per-row invariants (BASELINE.json:input_hint:
decoded-pixel allclose, PSNR ≥ 40 dB for lossy, phash stability)."""

import numpy as np
import pytest

from searchengine_ray.functions.imagecodec import (
    decode,
    decode_png,
    encode,
    encode_png,
    psnr,
)
from searchengine_ray.functions.phash import (
    hamming64,
    hamming64_vec,
    phash64,
    phash_bands,
)


def _img(seed, w=32, h=24):
    rng = np.random.RandomState(seed)
    # smooth-ish image: random low-res grid upsampled (more realistic than
    # white noise for phash)
    base = rng.randint(0, 255, size=(4, 4, 3), dtype=np.uint8)
    return np.repeat(np.repeat(base, h // 4 + 1, 0), w // 4 + 1, 1)[:h, :w]


def test_png_roundtrip_exact():
    img = _img(1)
    data = encode_png(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    out = decode_png(data)
    np.testing.assert_array_equal(img, out)


def test_png_noise_roundtrip():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(17, 13, 3), dtype=np.uint8)
    np.testing.assert_array_equal(img, decode_png(encode_png(img)))


def test_fake_jpeg_lossy_psnr_ge_40():
    img = _img(2)
    data = encode(img, "jpeg")
    out = decode(data, "jpeg")
    assert out.shape == img.shape
    p = psnr(img, out)
    assert p >= 40.0, p


def test_dct_codec_is_genuinely_lossy():
    """The PSNR invariant must be non-vacuous: the lossy codec really loses
    information (frequency-domain quantization), yet stays ≥ 40 dB even on
    white noise — the worst case for a DCT codec."""
    rng = np.random.RandomState(11)
    noise = rng.randint(0, 256, size=(40, 56, 3), dtype=np.uint8)
    out = decode(encode(noise, "jpeg"), "jpeg")
    assert not np.array_equal(noise, out)
    p = psnr(noise, out)
    assert 40.0 <= p < 60.0, p


def test_psnr_identical_inf():
    img = _img(4)
    assert psnr(img, img) == float("inf")


def test_phash_stability_across_encode_decode():
    img = _img(5)
    h1 = phash64(img)
    # lossless round-trip: identical hash
    assert phash64(decode(encode(img, "png"), "png")) == h1
    # lossy round-trip: small hamming distance
    h2 = phash64(decode(encode(img, "jpeg"), "jpeg"))
    assert hamming64(h1, h2) <= 4


def test_phash_discriminates():
    d = hamming64(phash64(_img(6)), phash64(_img(7)))
    assert d > 8


def test_hamming_vec_matches_scalar():
    hs = np.array([phash64(_img(s)) for s in range(8)], dtype=np.int64)
    v = int(hs[0])
    vec = hamming64_vec(hs, v)
    for i in range(8):
        assert vec[i] == hamming64(int(hs[i]), v)


def test_phash_bands_pigeonhole():
    # hamming ≤ 4 with 5 bands ⇒ at least one identical band
    a = phash64(_img(8))
    b = a ^ 0b1011  # 3 bits flipped
    assert hamming64(a, b) <= 4
    ba, bb = dict(phash_bands(a)), dict(phash_bands(b))
    assert any(ba[i] == bb[i] for i in range(5))


def test_unknown_fmt_raises():
    with pytest.raises(NotImplementedError):
        encode(_img(9), "webp")


# --- dihedral-canonical phash ------------------------------------------------


def test_dihedral_min_phash_exactly_invariant():
    from searchengine_ray.functions.phash import (
        dihedral_min_phash, dihedral_orbit, phash64)

    rng = np.random.RandomState(7)
    for shape in ((48, 64, 3), (33, 33, 3), (64, 48, 3)):
        px = (rng.rand(*shape) * 255).astype(np.uint8)
        base = dihedral_min_phash(px)
        for t in dihedral_orbit(px):
            assert dihedral_min_phash(np.ascontiguousarray(t)) == base
    # necessity: plain phash64 is NOT rotation invariant on a structured
    # image (left half bright, right half dark)
    px = np.zeros((40, 60, 3), dtype=np.uint8)
    px[:, :30] = 220
    assert phash64(np.rot90(px)) != phash64(px)
    assert dihedral_min_phash(np.rot90(px)) == dihedral_min_phash(px)


def test_dihedral_min_phash_survives_lossless_roundtrip():
    from searchengine_ray.functions.imagecodec import decode, encode
    from searchengine_ray.functions.phash import dihedral_min_phash

    rng = np.random.RandomState(9)
    px = (rng.rand(32, 48, 3) * 255).astype(np.uint8)
    rot = np.ascontiguousarray(np.rot90(px))
    # PNG is lossless: a re-encoded rotated copy hashes identically
    back = decode(encode(rot, "png"), "png")
    assert dihedral_min_phash(back) == dihedral_min_phash(px)
