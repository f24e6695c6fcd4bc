"""Text-analysis kernels: language-ID, quality scoring, token counting,
document fingerprinting.

These are the training-data-pipeline extensions (not in the reference);
all deterministic, vectorizable per batch.
"""

from __future__ import annotations

import re

import numpy as np

# --- language ID (n-gram / stopword heuristic) -----------------------------
# Tiny per-language stopword lists (public high-frequency function words).
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "pour", "que"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "por", "que"},
    "zh": set(),  # detected by CJK codepoint ratio instead
}

_WORD_RE = re.compile(r"[a-z']+")
_PUNCT_RE = re.compile(r"[^\w\s]")


def detect_language(text: str) -> str:
    """Heuristic language ID: CJK codepoint ratio, else stopword voting.

    Returns one of en/de/fr/es/zh/unknown."""
    if not text:
        return "unknown"
    cjk = sum(1 for ch in text[:2000] if "一" <= ch <= "鿿")
    if cjk / max(1, min(len(text), 2000)) > 0.05:
        return "zh"
    words = _WORD_RE.findall(text.lower()[:4000])
    if not words:
        return "unknown"
    best, best_hits = "unknown", 0
    for lang, stops in _LANG_STOPWORDS.items():
        if not stops:
            continue
        hits = sum(1 for w in words if w in stops)
        if hits > best_hits:
            best, best_hits = lang, hits
    return best if best_hits > 0 else "unknown"


def quality_features(text: str) -> dict[str, float]:
    """Length / punctuation / stopword-ratio features for quality filtering."""
    n_chars = len(text)
    words = text.split()
    n_words = len(words)
    mean_word_len = (sum(len(w) for w in words) / n_words) if n_words else 0.0
    n_punct = len(_PUNCT_RE.findall(text))
    stop = _LANG_STOPWORDS["en"]
    n_stop = sum(1 for w in words if w.lower() in stop)
    return {
        "n_chars": float(n_chars),
        "n_words": float(n_words),
        "mean_word_len": mean_word_len,
        "punct_ratio": n_punct / n_chars if n_chars else 0.0,
        "stopword_ratio": n_stop / n_words if n_words else 0.0,
    }


# BPE-ish token estimate: word chunks + digit runs + punctuation singles —
# a whitespace+regex approximation of byte-pair tokenizer counts.
_BPEISH_RE = re.compile(r"[A-Za-z]{1,8}|\d{1,3}|[^\sA-Za-z\d]")


def count_tokens_ws(text: str) -> int:
    return len(text.split())


def count_tokens_bpeish(text: str) -> int:
    return len(_BPEISH_RE.findall(text))


# --- rolling-hash document fingerprint -------------------------------------
_FP_BASE = 1000003
_FP_MOD = (1 << 61) - 1


def rolling_fingerprint(text: str, window: int = 64, keep_mod: int = 8) -> list[int]:
    """Winnowing-style fingerprint: polynomial rolling hash over a sliding
    byte window, keep hashes ≡ 0 (mod keep_mod) — a standard content-defined
    sampling fingerprint (Rabin/winnowing family)."""
    data = text.encode("utf-8", "ignore")
    if len(data) < window:
        h = 0
        for b in data:
            h = (h * _FP_BASE + b) % _FP_MOD
        return [h] if data else []
    pow_w = pow(_FP_BASE, window - 1, _FP_MOD)
    out = []
    h = 0
    for i, b in enumerate(data):
        if i >= window:
            h = (h - data[i - window] * pow_w) % _FP_MOD
        h = (h * _FP_BASE + b) % _FP_MOD
        if i >= window - 1 and h % keep_mod == 0:
            out.append(h)
    return out


def cosine_topk(
    embeddings: np.ndarray, query: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Brute-force cosine top-k: returns (indices, scores), scores desc.

    ``embeddings`` (n, d) float32/64; ``query`` (d,).  The per-batch kernel of
    the ANN baseline (one matmul per batch against a broadcast query)."""
    emb = embeddings.astype(np.float64)
    q = query.astype(np.float64)
    norms = np.linalg.norm(emb, axis=1) * np.linalg.norm(q)
    norms[norms == 0] = 1.0
    sims = emb @ q / norms
    k = min(k, sims.shape[0])
    idx = np.argpartition(-sims, k - 1)[:k]
    order = idx[np.argsort(-sims[idx], kind="stable")]
    return order, sims[order]
