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


# Per-worker-process reusable int64 workspaces — same discipline as
# minhash.batch_signatures / simhash.batch_simhash (fresh big allocations
# first-touch-fault at ~8 MB/s on this host; Ray workers run one task at
# a time so the module dict is race-free).
_FP_WS: dict[str, np.ndarray] = {}
_FP_BLOCK = 1 << 15  # tap-loop cache block (positions); tuned on-host


def _fp_buf(key: str, n: int) -> np.ndarray:
    buf = _FP_WS.get(key)
    if buf is None or buf.shape[0] < n:
        buf = np.empty(max(n, 1 << 16), dtype=np.int64)
        _FP_WS[key] = buf
    return buf[:n]


def batch_fingerprints(
    texts, window: int = 64, keep_mod: int = 8
) -> list[list[int]]:
    """Vectorized ``[rolling_fingerprint(t) for t in texts]`` — pinned
    BIT-IDENTICAL to the per-doc path by tests/test_minhash_simhash.py.

    All long docs' bytes concatenate into one int64 workspace; the
    window hash at every position is a 64-tap modular correlation
    h_i = Σ_k d[i-k]·B^k (mod 2^61-1), computed int64-overflow-safely by
    splitting the precomputed powers into 31/30-bit halves (products
    ≤ 2^39, 64-term sums ≤ 2^45) and folding with the Mersenne identity
    2^61 ≡ 1 (mod p).  Windows straddling a doc boundary are masked out;
    docs shorter than ``window`` take the trivial sequential path
    (< 64 bytes each).  No uint64 anywhere (this host's uint64 kernels
    run 100-300× slower than int64 — see CLAUDE.md)."""
    datas = [(t or "").encode("utf-8", "ignore") for t in texts]
    out: list = [None] * len(datas)
    long_idx = []
    for j, db in enumerate(datas):
        if len(db) < window:
            h = 0
            for b in db:
                h = (h * _FP_BASE + b) % _FP_MOD
            out[j] = [h] if db else []
        else:
            long_idx.append(j)
    if not long_idx:
        return out

    lens = np.array([len(datas[j]) for j in long_idx], dtype=np.int64)
    starts = np.zeros(len(long_idx) + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    n = int(starts[-1])
    d = _fp_buf("bytes", n)
    for s, j in zip(starts[:-1].tolist(), long_idx):
        db = datas[j]
        d[s:s + len(db)] = np.frombuffer(db, dtype=np.uint8)

    pw = np.empty(window, dtype=np.int64)
    v = 1
    for k in range(window):
        pw[k] = v
        v = (v * _FP_BASE) % _FP_MOD
    p_lo = pw & ((1 << 31) - 1)   # < 2^31
    p_hi = pw >> 31               # < 2^30

    m = n - window + 1            # window START positions (global)
    acc_lo = _fp_buf("acc_lo", m)
    acc_hi = _fp_buf("acc_hi", m)
    acc_lo[:] = 0
    acc_hi[:] = 0
    tmp = _fp_buf("tmp", min(m, _FP_BLOCK))
    # cache-blocked taps: all 64 taps run over one ~256 KB position block
    # while it is L2-hot (measured 2× over the flat whole-array passes)
    for s in range(0, m, _FP_BLOCK):
        e = min(s + _FP_BLOCK, m)
        al, ah, tm = acc_lo[s:e], acc_hi[s:e], tmp[:e - s]
        for k in range(window):
            seg = d[s + window - 1 - k:e + window - 1 - k]  # d[i-k]
            np.multiply(seg, p_lo[k], out=tm)
            al += tm
            np.multiply(seg, p_hi[k], out=tm)
            ah += tm
    # (acc_hi·2^31 + acc_lo) mod p with p = 2^61-1:  acc_hi = a1·2^30 + a0
    # ⇒ acc_hi·2^31 = a1·2^61 + a0·2^31 ≡ a1 + a0·2^31 (mod p)
    a0 = _fp_buf("a0", m)
    np.bitwise_and(acc_hi, (1 << 30) - 1, out=a0)
    acc_hi >>= 30                            # a1 < 2^14, in place
    a0 <<= 31                                # < 2^61
    t = acc_lo
    t += a0
    t += acc_hi                              # < 2^62: fold once
    h = acc_hi                               # reuse as the output buffer
    np.right_shift(t, 61, out=h)
    np.bitwise_and(t, _FP_MOD, out=a0)
    h += a0
    h[h >= _FP_MOD] -= _FP_MOD

    if keep_mod & (keep_mod - 1) == 0:
        np.bitwise_and(h, keep_mod - 1, out=a0)
    else:
        np.remainder(h, keep_mod, out=a0)
    keep = _FP_WS.get("keep")
    if keep is None or keep.shape[0] < m:
        keep = np.empty(max(m, 1 << 16), dtype=bool)
        _FP_WS["keep"] = keep
    keep = keep[:m]
    np.equal(a0, 0, out=keep)
    # window [m, m+window-1] valid iff it lies inside one doc:
    # start_j ≤ m (automatic: m's byte is in doc j) and m ≤ end_j - window
    # ⇔ m < valid-position count of its doc's prefix; per-doc fills into
    # reused buffers (ndocs tiny vs m — no np.repeat allocation)
    doc = _fp_buf("doc", m)
    st = starts[:-1].tolist()
    en = starts[1:].tolist()
    for jj in range(len(long_idx)):
        s_j = st[jj]
        doc[s_j:min(en[jj], m)] = jj
        # mask the last window-1 positions of the doc (straddle next doc)
        lo = max(en[jj] - window + 1, s_j)
        keep[lo:min(en[jj], m)] = False
    kept_doc = doc[keep]
    kept_h = h[keep]
    bounds = np.searchsorted(kept_doc, np.arange(len(long_idx) + 1))
    for jj, j in enumerate(long_idx):
        out[j] = kept_h[bounds[jj]:bounds[jj + 1]].tolist()
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
