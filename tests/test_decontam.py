"""Benchmark decontamination: planted-overlap detection plus an exact
brute-force oracle over random word-salad corpora (the SQL gate at sf0.01
checks the real fixture; these pin the semantics on adversarial shapes)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from searchengine_ray.functions.ngrams import overlapping_gram_hashes
from searchengine_ray.stages.decontam import (
    collect_bench_grams, decontaminate)
from searchengine_ray.stages.text import simple_tokens


def test_overlapping_gram_hashes_semantics():
    toks = ["a", "b", "c", "d", "e"]
    assert len(overlapping_gram_hashes(toks, 4)) == 2  # abcd, bcde
    assert overlapping_gram_hashes(["a", "b", "c"], 4) == set()
    # space-join disambiguates token boundaries (no-separator would alias)
    assert overlapping_gram_hashes(["ab", "c", "d", "e"], 4) != \
        overlapping_gram_hashes(["a", "bc", "d", "e"], 4)


def _run(train_rows, bench_rows, k=4):
    train = rd.from_pandas(pd.DataFrame(train_rows)).repartition(4)
    bench = rd.from_pandas(pd.DataFrame(bench_rows)).repartition(2)
    ref = collect_bench_grams(bench, gram_k=k)
    out = decontaminate(train, ref, gram_k=k).to_pandas()
    return out.set_index("doc_id").sort_index()


def test_planted_contamination(ray_session):
    bench = [{"doc_id": 100, "text": "alpha beta gamma delta epsilon"}]
    train = [
        # copies the 4-gram "beta gamma delta epsilon" inside other text
        {"doc_id": 1, "text": "xx yy beta gamma delta epsilon zz"},
        # shares only a 3-gram — clean at k=4
        {"doc_id": 2, "text": "beta gamma delta other words here pad"},
        # verbatim copy: every bench gram hits (2 grams of the 5-token doc)
        {"doc_id": 3, "text": "alpha beta gamma delta epsilon"},
        # disjoint vocabulary
        {"doc_id": 4, "text": "one two three four five six"},
        # shorter than k tokens: no grams, never contaminated
        {"doc_id": 5, "text": "alpha beta gamma"},
    ]
    out = _run(train, bench)
    assert out.loc[1, "contaminated"] and out.loc[1, "n_shared"] == 1
    assert not out.loc[2, "contaminated"]
    assert out.loc[3, "contaminated"] and out.loc[3, "n_shared"] == 2
    assert not out.loc[4, "contaminated"] and out.loc[4, "n_shared"] == 0
    assert not out.loc[5, "contaminated"]


def test_matches_bruteforce_on_random_corpus(ray_session):
    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab => real collisions
    def doc(n):
        return " ".join(rng.choice(vocab, size=n))
    bench = [{"doc_id": 1000 + i, "text": doc(rng.randint(2, 20))}
             for i in range(8)]
    train = [{"doc_id": i, "text": doc(rng.randint(2, 25))}
             for i in range(60)]
    k = 3
    bgrams = set().union(*(
        overlapping_gram_hashes(simple_tokens(r["text"]), k) for r in bench))
    out = _run(train, bench, k=k)
    for r in train:
        g = overlapping_gram_hashes(simple_tokens(r["text"]), k)
        exp = len(g & bgrams)
        assert out.loc[r["doc_id"], "n_shared"] == exp
        assert bool(out.loc[r["doc_id"], "contaminated"]) == (exp > 0)


def test_bench_gram_cap_raises(ray_session):
    bench = rd.from_pandas(pd.DataFrame(
        [{"doc_id": 0, "text": "a b c d e f g h i j"}]))
    with pytest.raises(ValueError, match="max_bench_grams"):
        collect_bench_grams(bench, gram_k=3, max_bench_grams=2)


# --- fuzzy (MinHash-LSH) cross-corpus decontamination ------------------------


def test_fuzzy_planted_near_copy(ray_session):
    from searchengine_ray.stages.decontam import (
        build_bench_index, minhash_cross_neardup)
    from searchengine_ray.functions.ngrams import shingle_hashes, jaccard
    from searchengine_ray.stages.text import simple_tokens

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon phi chi psi "
            "omega one two three four five six seven eight nine ten") * 3
    near = base + " tail edit"                 # tiny suffix edit
    verbatim = base
    unrelated = " ".join(f"w{i}" for i in range(120))
    bench = rd.from_pandas(pd.DataFrame(
        [{"doc_id": 900, "text": base},
         {"doc_id": 901, "text": unrelated + " distinct tail"}]))
    train = rd.from_pandas(pd.DataFrame(
        [{"doc_id": 1, "text": near},
         {"doc_id": 2, "text": verbatim},
         {"doc_id": 3, "text": unrelated.replace("w1 ", "q1 ")},
         {"doc_id": 4, "text": "short disjoint doc"},
         {"doc_id": 5, "text": ""}])).repartition(3)
    ref = build_bench_index(bench)
    out = (minhash_cross_neardup(train, ref, threshold=0.65)
           .to_pandas().sort_values(["doc_id", "bench_id"]))
    got = set(zip(out.doc_id, out.bench_id))
    assert (1, 900) in got and (2, 900) in got
    assert (3, 901) in got          # near-copy of the OTHER bench doc
    assert (3, 900) not in got      # ...and of that one only
    # exact jaccard values ride along
    sa = shingle_hashes(simple_tokens(near), 3)
    sb = shingle_hashes(simple_tokens(base), 3)
    want = round(jaccard(sa, sb), 6)
    assert float(out.set_index(["doc_id", "bench_id"])
                 .loc[(1, 900), "jaccard"]) == want
    assert float(out.set_index(["doc_id", "bench_id"])
                 .loc[(2, 900), "jaccard"]) == 1.0
    # sub-threshold / disjoint / empty docs never pair
    assert not {d for d, _ in got} & {4, 5}


def test_fuzzy_empty_bench_and_cap(ray_session):
    from searchengine_ray.stages.decontam import (
        build_bench_index, minhash_cross_neardup)
    empty_bench = rd.from_pandas(pd.DataFrame(
        {"doc_id": pd.Series([], dtype="int64"),
         "text": pd.Series([], dtype="object")}))
    train = rd.from_pandas(pd.DataFrame(
        [{"doc_id": 1, "text": "some words here to shingle"}]))
    ref = build_bench_index(empty_bench)
    assert minhash_cross_neardup(train, ref).to_pandas().empty
    big = rd.from_pandas(pd.DataFrame(
        [{"doc_id": i, "text": f"doc {i} words"} for i in range(5)]))
    with pytest.raises(ValueError, match="max_bench_docs"):
        build_bench_index(big, max_bench_docs=2)
