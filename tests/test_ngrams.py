"""N-gram shingles / Jaccard / near-dup gate vs reference ngrams.py."""

import math

from searchengine_ray.functions.ngrams import (
    MAX_ALLOWED_SIMILARITY,
    custom_string_hash,
    is_near_duplicate,
    jaccard,
    n_gram,
    shingle_hashes,
    stable_hash64,
)


def test_ngram_nonoverlapping_stride_with_tail():
    toks = ["a", "b", "c", "d", "e", "f", "g"]
    # stride 3, trailing partial tuple included (ngrams.py:35-44)
    assert n_gram(toks) == {("a", "b", "c"), ("d", "e", "f"), ("g",)}


def test_ngram_empty():
    assert n_gram([]) == set()


def test_stable_hash_deterministic():
    assert stable_hash64("abc") == stable_hash64("abc")
    assert stable_hash64("abc") != stable_hash64("abd")
    assert -(1 << 63) <= stable_hash64("zzz") < (1 << 63)


def test_custom_string_hash_parity():
    # reference ngrams.py:20-25 — sum of ords
    assert custom_string_hash("ab") == 97 + 98


def test_jaccard():
    assert jaccard({1, 2, 3}, {2, 3, 4}) == 0.5
    assert jaccard(set(), set()) == 0.0
    assert jaccard({1}, set()) == 0.0


def test_near_duplicate_gate():
    base = ["a", "b", "c", "d", "e", "f", "g", "h", "i"]
    a = shingle_hashes(base)
    # identical doc → jaccard 1.0 > .65 → duplicate
    assert is_near_duplicate(a, [a])
    # disjoint doc → 0.0 → not duplicate
    b = shingle_hashes(["x", "y", "z", "u", "v", "w"])
    assert not is_near_duplicate(b, [a])
    # threshold is strict > (ngrams.py:82,98)
    assert not is_near_duplicate(a, [])
    assert math.isclose(MAX_ALLOWED_SIMILARITY, 0.65)


def test_join_no_separator():
    # words joined with no separator before hashing (ngrams.py:53-56):
    # ("ab","c") and ("a","bc") therefore COLLIDE — reference behavior kept.
    assert shingle_hashes(["ab", "c"], n=3) == shingle_hashes(["a", "bc"], n=3)
