"""N-gram shingling + stable hashing + Jaccard similarity.

Reference: ``ngrams.py`` —

- shingles are NON-overlapping n-grams, stride = n = 3, including the
  trailing partial tuple (``ngrams.py:28-46``, ``DEFAULT_N_GRAM_SIZE=3``);
  the optional random subsample is disabled (``AMOUNT_OF_LIST_TO_SELECT=1``,
  ``ngrams.py:32``) and stays off here for determinism;
- each shingle's words are joined with NO separator and hashed
  (``ngrams.py:49-62``).  The reference uses Python's ``hash()`` which is
  salted per process — unreproducible across workers (SURVEY.md §7 hard part
  3).  We use blake2b-64 instead: stable, content-derived.  The reference's
  *set semantics* (what is a duplicate), not its raw hash values, are the
  contract;
- similarity = Jaccard over the shingle-hash sets (``ngrams.py:69-77``);
  a document is rejected when its Jaccard vs ANY previously accepted
  document exceeds ``MAX_ALLOWED_SIMILARITY = 0.65`` (``ngrams.py:11,80-101``).
"""

from __future__ import annotations

from hashlib import blake2b

MAX_ALLOWED_SIMILARITY = 0.65  # reference ngrams.py:11
DEFAULT_N_GRAM_SIZE = 3  # reference ngrams.py:14


def n_gram(tokens: list[str], n: int = DEFAULT_N_GRAM_SIZE) -> set[tuple[str, ...]]:
    """Non-overlapping n-gram tuples, stride n, trailing partial included
    (reference ngrams.py:28-46)."""
    return {tuple(tokens[i : i + n]) for i in range(0, len(tokens), n)}


def stable_hash64(s: str) -> int:
    """Content-derived signed 64-bit hash (replaces salted ``hash()``,
    reference ngrams.py:58; see module docstring)."""
    h = int.from_bytes(blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")
    return h - (1 << 64) if h >= (1 << 63) else h


def custom_string_hash(s: str) -> int:
    """Sum-of-ords hash (reference ngrams.py:20-25); kept for parity, unused
    by default (``USE_CUSTOM_STRING_HASH=False`` at ngrams.py:9)."""
    return sum(ord(c) for c in s)


def shingle_hashes(
    tokens: list[str], n: int = DEFAULT_N_GRAM_SIZE
) -> set[int]:
    """tokens → set of stable 64-bit shingle hashes (reference ngrams.py
    ``n_gram`` + ``make_set_of_n_gram_hashes``, :28-66; words joined with no
    separator per :53-56)."""
    return {stable_hash64("".join(t)) for t in n_gram(tokens, n)}


def overlapping_gram_hashes(tokens: list[str], k: int) -> set[int]:
    """Distinct stable 64-bit hashes of the OVERLAPPING k-token grams
    (stride 1, no trailing partial) — the decontamination unit (GPT-3-style
    benchmark n-gram overlap, Brown et al. 2020 App. C).  Unlike the
    reference's dedup shingles (non-overlapping, joined with no separator),
    grams here are space-joined so token boundaries are unambiguous and the
    SQL mirror is a plain ``array_to_string(ts[i:i+k], ' ')``."""
    return {
        stable_hash64(" ".join(tokens[i : i + k]))
        for i in range(0, len(tokens) - k + 1)
    }


def jaccard(a: set[int], b: set[int]) -> float:
    """|A∩B| / |A∪B| (reference ngrams.py:69-77).  Defined as 0.0 when both
    sets are empty (the reference would divide by zero — intent per
    SURVEY.md §7: empty shingle sets are never similar)."""
    if not a and not b:
        return 0.0
    return len(a & b) / len(a | b)


def is_near_duplicate(
    candidate: set[int],
    accepted: list[set[int]],
    max_allowed: float = MAX_ALLOWED_SIMILARITY,
) -> bool:
    """True when Jaccard vs ANY accepted set exceeds the threshold
    (reference ngrams.py:88-101 semantics; > not >=)."""
    return any(jaccard(candidate, prev) > max_allowed for prev in accepted)
