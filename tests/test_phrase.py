"""Positional phrase search (pipelines/search.phrase_search)."""

import numpy as np
import pandas as pd
import pytest


def _run(ray_session, texts, phrase):
    import ray.data as rd

    from searchengine_ray.pipelines.search import phrase_search

    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    out = phrase_search(rd.from_pandas(df).repartition(2), phrase).to_pandas()
    return dict(zip(out["doc_id"], out["n_matches"]))


def test_phrase_basic_and_boundaries(ray_session):
    got = _run(ray_session, [
        "fast merge is fast merge",     # 2 matches
        "fast, merge!",                 # punctuation separators still match
        "fast x merge",                 # not adjacent
        "merge fast",                   # wrong order
        "the fast merges",              # different token
        "",
    ], "fast merge")
    assert got == {0: 2, 1: 1}


def test_phrase_three_words_and_overlap(ray_session):
    got = _run(ray_session, [
        "a b a b a",   # "a b a" matches at 0 and 2 (overlapping)
        "a b a",
        "a b b a",
    ], "a b a")
    assert got == {0: 2, 1: 1}


def test_phrase_repeated_token(ray_session):
    got = _run(ray_session, [
        "go go go stop",   # "go go" at 0 and 1
        "go stop go",
    ], "go go")
    assert got == {0: 2}


def test_phrase_empty_raises(ray_session):
    import ray.data as rd

    from searchengine_ray.pipelines.search import phrase_search

    df = pd.DataFrame({"doc_id": [0], "text": ["x"]})
    with pytest.raises(ValueError):
        phrase_search(rd.from_pandas(df), "  !! ")
