"""Vocabulary build + token-id encode (stages/text.vocab_encode)."""

import numpy as np
import pandas as pd


# --- vocab build + token-id encode --------------------------------------------


def test_vocab_encode_matches_brute_force(ray_session):
    import ray.data as rd

    from searchengine_ray.stages.text import simple_tokens, vocab_encode

    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["the cat sat on the mat",
                 "the dog SAT on a log",
                 "cat and dog and cat",
                 "zzz unique tokens here",
                 "the the the",
                 "punct,separated;tokens!here"]})
    vocab, enc = vocab_encode(rd.from_pandas(docs).repartition(3),
                              vocab_size=5)
    got = enc.to_pandas().sort_values("doc_id").reset_index(drop=True)
    # brute-force vocabulary: count desc, token asc, top 5
    from collections import Counter
    c = Counter()
    for t in docs["text"]:
        c.update(simple_tokens(t))
    ref_vocab = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert list(vocab["token"]) == [t for t, _ in ref_vocab]
    assert list(vocab["tid"]) == list(range(5))
    tid = {t: i for i, (t, _) in enumerate(ref_vocab)}
    for _, row in got.iterrows():
        toks = simple_tokens(docs["text"][row["doc_id"]])
        ref_ids = " ".join(str(tid.get(t, -1)) for t in toks)
        assert row["ids"] == ref_ids and row["n_tokens"] == len(toks)


def test_vocab_encode_empty_text_and_oov(ray_session):
    import ray.data as rd

    from searchengine_ray.stages.text import vocab_encode

    docs = pd.DataFrame({"doc_id": np.array([0, 1, 2], dtype=np.int64),
                         "text": ["alpha beta", "", "gamma gamma"]})
    vocab, enc = vocab_encode(rd.from_pandas(docs), vocab_size=2)
    got = enc.to_pandas().sort_values("doc_id").reset_index(drop=True)
    # vocab: gamma (2) then alpha/beta tie → alpha; beta is OOV
    assert list(vocab["token"]) == ["gamma", "alpha"]
    assert got.loc[0, "ids"] == "1 -1"
    assert got.loc[1, "ids"] == "" and got.loc[1, "n_tokens"] == 0
    assert got.loc[2, "ids"] == "0 0"
