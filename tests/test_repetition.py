"""Repetition / duplicated-window scoring (stages/repetition.py)."""

import numpy as np
import pandas as pd
import pytest

from searchengine_ray.stages.repetition import (
    dup_window_stats, repetition_batch, repetition_stats)


def test_repetition_batch_hand_computed():
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "a b a b a",          # 5 toks: top tok 'a'×3; bigrams: ab,ba,ab,ba
            "x y z",              # all distinct
            "",                   # empty
            "solo",               # one token, no bigrams
        ],
    })
    out = repetition_batch(df).set_index("doc_id")
    assert out.loc[0, "n_tokens"] == 5
    assert out.loc[0, "top_token_frac"] == pytest.approx(3 / 5)
    # bigrams of doc 0: 4 positions, 2 distinct, max count 2
    assert out.loc[0, "top_2gram_frac"] == pytest.approx(2 / 4)
    assert out.loc[0, "dup_2gram_frac"] == pytest.approx(1 - 2 / 4)
    assert out.loc[1, "top_token_frac"] == pytest.approx(1 / 3)
    assert out.loc[1, "dup_2gram_frac"] == 0.0
    assert out.loc[2, "n_tokens"] == 0
    assert (out.loc[2, ["top_token_frac", "top_2gram_frac",
                        "dup_2gram_frac"]] == 0.0).all()
    assert out.loc[3, "n_tokens"] == 1
    assert out.loc[3, "top_token_frac"] == 1.0
    assert out.loc[3, "top_2gram_frac"] == 0.0


def test_repetition_stats_dataset(ray_session):
    import ray.data as rd

    df = pd.DataFrame({
        "doc_id": np.arange(50, dtype=np.int64),
        "text": [("w " * (i % 7 + 1)) + f"unique{i}" for i in range(50)],
    })
    out = (repetition_stats(rd.from_pandas(df).repartition(4))
           .to_pandas().set_index("doc_id").sort_index())
    assert len(out) == 50
    # doc i: (i%7+1) copies of 'w' + 1 unique token
    for i in (0, 6, 13):
        n = i % 7 + 1
        assert out.loc[i, "n_tokens"] == n + 1
        assert out.loc[i, "top_token_frac"] == pytest.approx(
            round(n / (n + 1), 6))


def test_dup_window_stats_planted(ray_session):
    import ray.data as rd

    shared = " ".join(f"s{i}" for i in range(10))  # 10-token shared run
    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [
            shared + " tail0 tail1",                  # doc 0: shares with 1
            "head0 head1 " + shared,                  # doc 1
            " ".join(f"u{i}" for i in range(12)),     # doc 2: unique
            "short text",                             # doc 3: < 8 tokens
        ],
    })
    out = (dup_window_stats(rd.from_pandas(docs).repartition(3), k=8)
           .to_pandas().set_index("doc_id").sort_index())
    # doc 3 has no 8-token window → absent
    assert list(out.index) == [0, 1, 2]
    # doc 0: 12 tokens → 5 windows; the 3 windows fully inside the shared
    # 10-token run also occur in doc 1 → dup
    assert out.loc[0, "n_windows"] == 5
    assert out.loc[0, "n_dup_windows"] == 3
    assert out.loc[0, "dup_frac"] == pytest.approx(0.6)
    assert out.loc[1, "n_dup_windows"] == 3
    assert out.loc[2, "n_windows"] == 5
    assert out.loc[2, "n_dup_windows"] == 0
    assert out.loc[2, "dup_frac"] == 0.0


def test_dup_window_within_doc_repeat_not_cross(ray_session):
    """A window repeated WITHIN one doc (but in no other doc) is not a
    cross-doc dup; all its positions count in the denominator."""
    import ray.data as rd

    run = " ".join(f"r{i}" for i in range(8))
    docs = pd.DataFrame({
        "doc_id": np.array([7], dtype=np.int64),
        "text": [run + " " + run],  # 16 tokens, window repeats at pos 0 & 8
    })
    out = dup_window_stats(rd.from_pandas(docs), k=8).to_pandas()
    assert out.loc[0, "n_windows"] == 9
    assert out.loc[0, "n_dup_windows"] == 0


def test_remove_dup_spans_planted(ray_session):
    """ExactSubstr cleaning: tokens covered by any 8-token window occurring
    >= 2 times anywhere in the corpus are cut; everything else survives."""
    import ray.data as rd

    from searchengine_ray.stages.repetition import remove_dup_spans

    shared = " ".join(f"s{i}" for i in range(10))  # 10-token shared run
    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [
            shared + " tail0 tail1",               # shares the run with doc 1
            "head0 head1 " + shared,               # shares the run with doc 0
            " ".join(f"u{i}" for i in range(12)),  # unique -> untouched
            "short text",                          # < 8 tokens -> untouched
        ],
    })
    out = (remove_dup_spans(rd.from_pandas(docs).repartition(3), k=8)
           .to_pandas().set_index("doc_id").sort_index())
    assert list(out.index) == [0, 1, 2, 3]
    # docs 0/1: every position of the shared 10-token run is covered by a
    # duplicated window; the flanking tokens survive
    assert out.loc[0, "n_tokens"] == 12 and out.loc[0, "n_removed"] == 10
    assert out.loc[0, "clean_text"] == "tail0 tail1"
    assert out.loc[1, "n_removed"] == 10
    assert out.loc[1, "clean_text"] == "head0 head1"
    assert out.loc[2, "n_removed"] == 0
    assert out.loc[2, "clean_text"] == " ".join(f"u{i}" for i in range(12))
    assert out.loc[3, "n_removed"] == 0
    assert out.loc[3, "clean_text"] == "short text"


def test_remove_dup_spans_within_doc_repeat(ray_session):
    """min_count counts TOTAL occurrences (Lee et al. semantics): a window
    repeated twice within ONE doc is duplicated and gets cut there too."""
    import ray.data as rd

    from searchengine_ray.stages.repetition import remove_dup_spans

    run = " ".join(f"r{i}" for i in range(8))
    docs = pd.DataFrame({
        "doc_id": np.array([7], dtype=np.int64),
        "text": ["lead " + run + " mid " + run + " trail"],  # 19 tokens
    })
    out = remove_dup_spans(rd.from_pandas(docs), k=8).to_pandas()
    assert out.loc[0, "n_tokens"] == 19
    # both copies of the 8-token run are cut; lead/mid/trail survive
    assert out.loc[0, "n_removed"] == 16
    assert out.loc[0, "clean_text"] == "lead mid trail"


def test_remove_dup_spans_all_removed_and_empty(ray_session):
    import ray.data as rd

    from searchengine_ray.stages.repetition import remove_dup_spans

    run = " ".join(f"d{i}" for i in range(8))
    docs = pd.DataFrame({
        "doc_id": np.array([0, 1, 2], dtype=np.int64),
        "text": [run, run, ""],  # exact 8-token dups + an empty doc
    })
    out = (remove_dup_spans(rd.from_pandas(docs), k=8)
           .to_pandas().set_index("doc_id").sort_index())
    assert (out.loc[[0, 1], "n_removed"] == 8).all()
    assert (out.loc[[0, 1], "clean_text"] == "").all()
    assert out.loc[2, "n_tokens"] == 0 and out.loc[2, "clean_text"] == ""


def test_remove_dup_spans_routes_identical(ray_session):
    """Broadcast-cut and co-shuffle-cut routes produce identical output
    (the size-routing discipline: pagerank/CC pattern)."""
    import ray.data as rd

    from searchengine_ray.stages.repetition import remove_dup_spans

    rng = np.random.RandomState(11)
    shared = " ".join(f"s{i}" for i in range(9))
    texts = []
    for i in range(60):
        words = [f"w{rng.randint(0, 40)}" for _ in range(14)]
        if i % 4 == 0:
            words[3:12] = shared.split()
        texts.append(" ".join(words))
    docs = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64),
                         "text": texts})
    ds = rd.from_pandas(docs).repartition(5)
    a = (remove_dup_spans(ds, k=8)  # broadcast route (default limit)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (remove_dup_spans(ds, k=8, broadcast_dup_limit=0)  # co-shuffle
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert (a["n_removed"] > 0).any()
