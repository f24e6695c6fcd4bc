"""Bigram-LM perplexity scoring (stages/lm.py) — hand-computed reference."""

import math

import numpy as np
import pandas as pd
import pytest

from searchengine_ray.stages.lm import lm_perplexity, train_bigram_lm


def _docs(rows):
    return pd.DataFrame({
        "doc_id": np.arange(len(rows), dtype=np.int64),
        "text": rows})


def test_lm_hand_computed(ray_session):
    import ray.data as rd

    # train corpus: "a b" x2 and "a c" -> c(a)=3, c(b)=2, c(c)=1;
    # c(a,b)=2, c(a,c)=1; V = 3 vocab + 1 OOV = 4
    train = rd.from_pandas(_docs(["a b", "a b", "a c"]))
    model = train_bigram_lm(train)
    assert model.vocab_plus_oov == 4

    score = rd.from_pandas(_docs(["a b", "a z", "b a", "solo"]))
    out = lm_perplexity(score, model).to_pandas().set_index("doc_id")

    # doc 0: p(b|a) = (2+1)/(3+4) = 3/7
    assert out.loc[0, "logppl"] == pytest.approx(
        round(-math.log(3 / 7), 6))
    # doc 1: unseen bigram (a,z): p = (0+1)/(3+4) = 1/7
    assert out.loc[1, "logppl"] == pytest.approx(
        round(-math.log(1 / 7), 6))
    # doc 2: unseen prev context b->a: p = (0+1)/(2+4) = 1/6
    assert out.loc[2, "logppl"] == pytest.approx(
        round(-math.log(1 / 6), 6))
    # doc 3: single token -> no bigrams -> absent
    assert 3 not in out.index
    assert (out["n_bigrams"] == 1).all()


def test_lm_oov_context(ray_session):
    import ray.data as rd

    train = rd.from_pandas(_docs(["x y"]))
    model = train_bigram_lm(train)  # V = 2 + 1 = 3
    out = lm_perplexity(
        rd.from_pandas(_docs(["q r"])), model).to_pandas()
    # fully OOV: p = (0+1)/(0+3) = 1/3
    assert out.loc[0, "logppl"] == pytest.approx(round(math.log(3.0), 6))


def test_lm_model_cap(ray_session):
    import ray.data as rd

    train = rd.from_pandas(_docs(["a b c d e f g h"]))
    with pytest.raises(ValueError, match="max_model_rows"):
        train_bigram_lm(train, max_model_rows=3)


def test_lm_tercile_buckets(ray_session):
    """head/middle/tail terciles: ordered by logppl, sizes n/3 each when
    scores are distinct, boundaries at the interpolated terciles."""
    import ray.data as rd

    from searchengine_ray.stages.sketches import exact_global_quantile

    train = rd.from_pandas(_docs(["common words here"] * 3))
    model = train_bigram_lm(train)
    # 9 docs with increasingly OOV content -> strictly rising perplexity
    rows = ["common words here",          # fully in-domain
            "common words here common words",
            "common words oov1",
            "common oov1 oov2",
            "oov1 oov2 oov3",
            "oov1 oov2 oov3 oov4",
            "oov1 oov2 oov3 oov4 oov5",
            "oov1 oov2 oov3 oov4 oov5 oov6",
            "oov1 oov2 oov3 oov4 oov5 oov6 oov7"]
    scored = lm_perplexity(rd.from_pandas(_docs(rows)), model).materialize()
    t1 = exact_global_quantile(scored, "logppl", 1 / 3)
    t2 = exact_global_quantile(scored, "logppl", 2 / 3)
    df = scored.to_pandas()
    head = df[df.logppl <= t1]
    mid = df[(df.logppl > t1) & (df.logppl <= t2)]
    tail = df[df.logppl > t2]
    assert len(df) == 9
    assert len(head) >= 3 and len(tail) >= 1
    assert len(head) + len(mid) + len(tail) == 9
    if len(head) and len(mid):
        assert head["logppl"].max() <= mid["logppl"].min()
    if len(mid) and len(tail):
        assert mid["logppl"].max() <= tail["logppl"].min()
    # the fully in-domain doc is in head; the most SURPRISING doc — a
    # well-known context followed by an unseen token (p = 1/(c(prev)+V),
    # smaller than the all-OOV 1/V) — is in tail
    assert 0 in set(head["doc_id"]) and 3 in set(tail["doc_id"])
