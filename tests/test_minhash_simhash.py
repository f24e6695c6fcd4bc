"""MinHash / SimHash / textstats kernel tests."""

import numpy as np

from searchengine_ray.functions.minhash import band_keys, make_coeffs, minhash_signature
from searchengine_ray.functions.ngrams import jaccard
from searchengine_ray.functions.simhash import simhash64
from searchengine_ray.functions.textstats import (
    cosine_topk,
    count_tokens_bpeish,
    count_tokens_ws,
    detect_language,
    quality_features,
    rolling_fingerprint,
)


def test_minhash_estimates_jaccard():
    rng = np.random.RandomState(0)
    a, b = make_coeffs(256)
    s1 = set(rng.randint(0, 1 << 60, 200).tolist())
    # 50% overlap
    s2 = set(list(s1)[:100]) | set(rng.randint(0, 1 << 60, 100).tolist())
    sig1 = minhash_signature(np.array(sorted(s1), dtype=np.int64), a, b)
    sig2 = minhash_signature(np.array(sorted(s2), dtype=np.int64), a, b)
    est = np.mean(sig1 == sig2)
    true = jaccard(s1, s2)
    assert abs(est - true) < 0.12, (est, true)


def test_minhash_identical_and_empty():
    a, b = make_coeffs(64)
    s = np.array([1, 2, 3], dtype=np.int64)
    assert (minhash_signature(s, a, b) == minhash_signature(s, a, b)).all()
    e = minhash_signature(np.array([], dtype=np.int64), a, b)
    assert (e == e[0]).all()


def test_band_keys_deterministic():
    a, b = make_coeffs(128)
    sig = minhash_signature(np.array([5, 6, 7], dtype=np.int64), a, b)
    k1, k2 = band_keys(sig, 16), band_keys(sig, 16)
    assert k1 == k2
    assert len(k1) == 16


def test_simhash_near_and_far():
    base = ("the quick brown fox jumps over the lazy dog " * 20).split()
    near = list(base)
    near[3] = "red"
    far = ("completely different words entirely unrelated text here now " * 15).split()
    h0, h1, h2 = simhash64(base), simhash64(near), simhash64(far)
    from searchengine_ray.functions.phash import hamming64

    assert hamming64(h0, h1) < hamming64(h0, h2)
    assert simhash64([]) == 0


def test_langid():
    assert detect_language("the cat and the dog is in the house for a while") == "en"
    assert detect_language("der Hund und die Katze ist nicht ein Tier zu den") == "de"
    assert detect_language("你好世界这是中文文本测试内容") == "zh"
    assert detect_language("") == "unknown"


def test_quality_features():
    q = quality_features("Hello world, this is the test.")
    assert q["n_words"] == 6.0
    assert q["n_chars"] == 30.0
    assert 0 < q["punct_ratio"] < 0.2
    assert q["stopword_ratio"] > 0


def test_token_counts():
    assert count_tokens_ws("a b  c") == 3
    assert count_tokens_bpeish("hello, world 123") >= 4


def test_rolling_fingerprint_deterministic_and_shift_tolerant():
    t = "x" * 10 + "the quick brown fox jumps over the lazy dog " * 30
    f1 = rolling_fingerprint(t)
    f2 = rolling_fingerprint("PREFIX " + t)
    assert f1 == rolling_fingerprint(t)
    # content-defined sampling → shifted copies share most fingerprints
    inter = len(set(f1) & set(f2))
    assert inter / max(1, len(set(f1))) > 0.8


def test_batch_fingerprints_bit_identical_to_per_doc():
    """The vectorized batch kernel (cache-blocked modular correlation over
    concatenated bytes) must equal the per-doc rolling hash EXACTLY —
    boundary shapes: empty, sub-window, == window, window±1, multi-byte
    utf-8, and a mixed random batch (incl. non-default window/keep_mod)."""
    import random

    from searchengine_ray.functions.textstats import batch_fingerprints

    rng = random.Random(7)
    cases = ["", "a", "x" * 63, "y" * 64, "z" * 65,
             "the quick brown fox " * 20, "日本語テキストのサンプル" * 12]
    for _ in range(120):
        n = rng.randrange(0, 400)
        cases.append("".join(chr(rng.randrange(32, 0x3000))
                             for _ in range(n)))
    assert batch_fingerprints(cases) == [rolling_fingerprint(t)
                                         for t in cases]
    assert (batch_fingerprints(cases, window=16, keep_mod=5)
            == [rolling_fingerprint(t, window=16, keep_mod=5)
                for t in cases])
    # spans multiple cache blocks (> _FP_BLOCK positions in one doc)
    giant = ["word%d " % i for i in range(12000)]
    giant = ["".join(giant), "tail doc " * 30]
    assert batch_fingerprints(giant) == [rolling_fingerprint(t)
                                         for t in giant]


def test_cosine_topk():
    emb = np.array([[1, 0], [0, 1], [0.9, 0.1], [-1, 0]], dtype=np.float64)
    idx, scores = cosine_topk(emb, np.array([1.0, 0.0]), 2)
    assert idx[0] == 0
    assert idx[1] == 2
    assert scores[0] >= scores[1]


def test_batch_signatures_equals_per_doc_across_chunks():
    """The chunked, workspace-reusing batch signer must be bit-identical to
    the per-doc path — including empty docs, docs larger than the chunk
    width (the chunk-overshoot regression), and repeated calls that reuse
    the grown workspace."""
    from searchengine_ray.functions.minhash import batch_signatures

    rng = np.random.RandomState(5)
    a, b = make_coeffs(128)
    sizes = [0, 1, 17, 500, 0, 3, 9000, 7, 8192, 8193, 2]
    arrs = [rng.randint(-2**63, 2**63 - 1, size=n, dtype=np.int64)
            for n in sizes]
    for _ in range(2):  # second call reuses the per-process workspace
        got = batch_signatures(arrs, a, b, chunk_shingles=1 << 10)
        want = np.stack([minhash_signature(s, a, b) for s in arrs])
        assert np.array_equal(got, want)
        assert got.dtype == np.int64


def test_affine_matrix_matches_bigint_ground_truth():
    from searchengine_ray.functions.minhash import _P, _affine_matrix

    rng = np.random.RandomState(9)
    a, b = make_coeffs(16)
    xs = np.concatenate([
        rng.randint(-2**63, 2**63 - 1, size=64, dtype=np.int64),
        np.array([0, 1, _P - 1, _P, _P + 1, 2**61 - 1, -1, -2**63,
                  2**63 - 1], dtype=np.int64)])
    m = _affine_matrix(xs, a, b)
    M = (1 << 61) - 1
    for pi in range(16):
        for si, x in enumerate(xs):
            x61 = int(x) & M
            assert int(m[pi, si]) == (int(a[pi]) * x61 + int(b[pi])) % _P


def test_batch_simhash_equals_per_doc_across_chunks():
    from searchengine_ray.functions.simhash import (batch_simhash,
                                                    simhash64_from_hashes)

    rng = np.random.RandomState(6)
    arrs, ws = [], []
    for n in [0, 1, 5, 60, 0, 5000, 3, 200, 1024, 1025]:
        arrs.append(rng.randint(-2**63, 2**63 - 1, size=n, dtype=np.int64))
        ws.append(rng.randint(1, 5, size=n).astype(np.float64))
    for _ in range(2):
        got = batch_simhash(arrs, ws, chunk_features=1 << 9)
        want = np.array([simhash64_from_hashes(h, w)
                         for h, w in zip(arrs, ws)], dtype=np.int64)
        assert np.array_equal(got, want)
