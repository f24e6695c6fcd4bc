"""Byte-pair-encoding tokenizer training + encoding (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units").

The scalable shape (and why this survives 100 TB): BPE training never needs
the corpus — it needs the DISTINCT-WORD frequency table, which is bounded
by vocabulary (~10^6-10^7 rows for web-scale corpora) regardless of corpus
size.  The distributed part is therefore exactly one word-count
``pre_aggregate`` (map-side combined); the merge loop runs on that bounded
table.  Encoding is map-only: the learned merge ranks broadcast once and
each worker keeps a per-word encode cache (words repeat heavily — Zipf).

Determinism contract: merge selection breaks ties by (count DESC, pair
lexicographic ASC), so the same corpus always yields the same merge list.
"""

from __future__ import annotations

from collections import Counter

END_OF_WORD = "</w>"


def word_symbols(word: str) -> tuple[str, ...]:
    """A word's initial symbol sequence: characters + end-of-word marker
    (the marker keeps merges from crossing word boundaries when decoding)."""
    return tuple(word) + (END_OF_WORD,)


def train_bpe_from_counts(word_counts: dict[str, int],
                          num_merges: int) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a word-frequency table.

    Each round counts adjacent symbol pairs weighted by word frequency,
    merges the most frequent pair everywhere, and records it.  Stops early
    when no pair occurs twice.  O(num_merges × Σ|word|) over DISTINCT
    words — corpus-size-independent."""
    seqs: dict[tuple[str, ...], int] = {
        word_symbols(w): c for w, c in word_counts.items() if w}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for seq, cnt in seqs.items():
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        top_cnt = max(pairs.values())
        if top_cnt < 2:
            break
        # tie-break: count DESC, then pair lexicographic ASC
        pair = min(p for p, c in pairs.items() if c == top_cnt)
        merges.append(pair)
        merged = pair[0] + pair[1]
        new_seqs: dict[tuple[str, ...], int] = {}
        for seq, cnt in seqs.items():
            out = []
            i = 0
            while i < len(seq):
                if (i + 1 < len(seq) and seq[i] == pair[0]
                        and seq[i + 1] == pair[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            ns = tuple(out)
            new_seqs[ns] = new_seqs.get(ns, 0) + cnt
        seqs = new_seqs
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merge application (the standard BPE encode:
    repeatedly merge the present pair with the smallest learned rank)."""
    seq = list(word_symbols(word))
    while len(seq) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(seq, seq[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        seq[best_i:best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


class BPEEncoder:
    """Per-worker encoder: merge ranks + a word→tokens cache (Zipf makes
    the cache hit rate very high; capped to bound worker memory)."""

    def __init__(self, merges: list[tuple[str, str]],
                 cache_cap: int = 200_000):
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.cache: dict[str, list[str]] = {}
        self.cache_cap = cache_cap

    def encode(self, words: list[str]) -> list[str]:
        out: list[str] = []
        for w in words:
            toks = self.cache.get(w)
            if toks is None:
                toks = encode_word(w, self.ranks)
                if len(self.cache) < self.cache_cap:
                    self.cache[w] = toks
            out.extend(toks)
        return out


# Per-process encoder cache (the module is imported once per worker, so
# this persists across batches — same discipline as the minhash/simhash
# reusable workspaces).
_ENCODERS: dict[tuple, "BPEEncoder"] = {}


def get_encoder(merges) -> "BPEEncoder":
    key = tuple(tuple(p) for p in merges)
    enc = _ENCODERS.get(key)
    if enc is None:
        if len(_ENCODERS) > 4:  # different merge tables are rare; bound it
            _ENCODERS.clear()
        enc = BPEEncoder(list(key))
        _ENCODERS[key] = enc
    return enc
