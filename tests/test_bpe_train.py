"""BPE training/encoding (functions/bpe.py, stages/text.py wrappers)."""

import numpy as np
import pandas as pd

from searchengine_ray.functions.bpe import (
    BPEEncoder, END_OF_WORD, encode_word, train_bpe_from_counts)


def _naive_bpe(word_counts, num_merges):
    """Independent reference: same algorithm written the slow/obvious way."""
    vocab = {tuple(w) + (END_OF_WORD,): c for w, c in word_counts.items() if w}
    merges = []
    for _ in range(num_merges):
        pair_counts = {}
        for seq, c in vocab.items():
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts or max(pair_counts.values()) < 2:
            break
        best = min(p for p, c in pair_counts.items()
                   if c == max(pair_counts.values()))
        merges.append(best)
        new_vocab = {}
        for seq, c in vocab.items():
            s = list(seq)
            out = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                    out.append(s[i] + s[i + 1])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + c
        vocab = new_vocab
    return merges


def test_train_matches_naive_reference():
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "new": 2}
    for n in (1, 5, 20):
        assert train_bpe_from_counts(wc, n) == _naive_bpe(wc, n)


def test_sennrich_worked_example_first_merges():
    # Sennrich et al. 2016 §3.2 example: {'low':5,'lower':2,'newest':6,
    # 'widest':3} — the most frequent first pairs are ('e','s') then
    # ('es','t') then ('est','</w>'), driven by newest+widest (6+3=9).
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe_from_counts(wc, 3)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", END_OF_WORD)


def test_encode_concat_roundtrip_and_rank_priority():
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe_from_counts(wc, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ("low", "lower", "newest", "widest", "lowest", "unseen"):
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + END_OF_WORD  # lossless segmentation
    # a trained word compresses below character count
    assert len(encode_word("newest", ranks)) < len("newest") + 1


def test_encoder_cache_consistent():
    merges = train_bpe_from_counts({"aaab": 4, "aab": 3}, 5)
    enc = BPEEncoder(merges)
    first = enc.encode(["aaab", "aab", "aaab"])
    second = enc.encode(["aaab", "aab", "aaab"])  # cache hits
    assert first == second


def test_bpe_dataset_pipeline(ray_session):
    import ray.data as rd

    from searchengine_ray.stages.text import bpe_token_stats, bpe_train

    texts = (["the merge the merge fast"] * 10
             + ["scan table scan table slow"] * 8 + [""])
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    ds = rd.from_pandas(df).repartition(3)
    merges = bpe_train(ds, num_merges=12)
    # distributed word counts feed the same trainer as a driver-side count
    from collections import Counter
    wc = Counter(w for t in texts for w in t.split())
    assert merges == train_bpe_from_counts(dict(wc), 12)
    out = bpe_token_stats(ds, merges).to_pandas().set_index("doc_id")
    assert (out["n_bpe_tokens"] >= out["n_words"]).all()  # ≥ 1 token/word
    assert out.loc[len(texts) - 1, "n_words"] == 0
    assert out.loc[len(texts) - 1, "n_bpe_tokens"] == 0
    # trained merges compress the repeated vocabulary below chars+marker
    chars0 = sum(len(w) + 1 for w in texts[0].split())
    assert out.loc[0, "n_bpe_tokens"] < chars0
