"""Edit-distance threshold join (Ed-Join): the vectorized DP kernel vs a
sequential reference, the batch gram explode vs per-doc packing, and the
full distributed pipeline vs brute force — including the sentinel-bucket
plants (gram-poor / empty strings) where the prefix-filter guarantee is
vacuous and a naive implementation silently loses pairs."""

import random

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def _ref_lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[lb]


def test_levenshtein_batch_matches_reference():
    from searchengine_ray.stages.editdist import levenshtein_batch

    random.seed(3)
    al, bl = [], []
    for _ in range(300):
        al.append("".join(random.choice("abcde")
                          for _ in range(random.randint(0, 12))))
        bl.append("".join(random.choice("abcde")
                          for _ in range(random.randint(0, 12))))
    al += ["", "", "kitten", "flaw", "日本語のテスト"]
    bl += ["", "abc", "sitting", "lawn", "日本語てすと"]
    got = levenshtein_batch(al, bl)
    want = np.array([_ref_lev(a, b) for a, b in zip(al, bl)])
    assert (got == want).all()


def test_gram_explode_matches_per_doc():
    from searchengine_ray.stages.editdist import (
        _codes, _explode_grams_batch, _pack_grams)

    random.seed(5)
    texts = ["".join(random.choice("abcdef ")
                     for _ in range(random.randint(0, 20)))
             for _ in range(60)] + ["", "ab", "abc"]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "s": texts,
                       "l": [len(s) for s in texts]})
    out = _explode_grams_batch(df, 3, 6)
    for d, s in enumerate(texts):
        rows = out[out["doc_id"] == d]
        g = _pack_grams(_codes(s), 3)
        want = set(g.tolist()) | ({-1} if g.size <= 6 else set())
        assert set(rows["g"].tolist()) == want
        assert (rows["l"].to_numpy() == len(s)).all()


def test_edit_distance_pairs_matches_brute_force(ray_session):
    from searchengine_ray.stages.editdist import edit_distance_pairs

    random.seed(9)
    words = ["alpha", "beta", "gamma", "delta", "omega",
             "sigma", "kappa", "theta"]
    texts = [" ".join(random.choice(words) for _ in range(5))
             for _ in range(100)]
    # plants: near strings, gram-poor shorties (sentinel bucket), empties
    texts += [texts[0], texts[0][:-1] + "x", texts[1].replace("a", "e", 2),
              "ab", "abx", "", "xy", "abc", "abd", "zzzz"]
    D = 4
    want = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            d = _ref_lev(texts[a], texts[b])
            if d <= D:
                want[(a, b)] = d
    # the plants bind: short-short pairs with ZERO shared grams must appear
    assert ("ab", "xy") == (texts[-7], texts[-4]) and want[(103, 106)] == 2
    assert len(want) >= 8

    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts})).repartition(4)
    # BOTH routes must equal the brute force: rho > 1 forces the prefix
    # filter, rho = 0 forces the dense blocked path (the small dense
    # vocabulary here would otherwise always route dense)
    for rho in (1.1, 0.0):
        out = edit_distance_pairs(ds, max_dist=D,
                                  dense_route_rho=rho).to_pandas()
        got = {(int(a), int(b)): int(d)
               for a, b, d in zip(out["doc_a"], out["doc_b"], out["dist"])}
        assert got == want, rho


def test_edit_distance_prefix_chars_and_boundary(ray_session):
    """prefix_chars truncation binds, and the <= boundary is exact: a pair
    at dist == max_dist survives while dist == max_dist+1 is dropped."""
    from searchengine_ray.stages.editdist import edit_distance_pairs

    long_tail = " with a very long differing tail that truncation removes"
    texts = ["the shared title prefix aaaa" + long_tail,
             "the shared title prefix bbbb",            # dist 4 in 28 chars
             "the sharey title prefix cccc",            # dist 5 to #0 prefix
             "unrelated different string entirely"]
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts}))
    out = edit_distance_pairs(ds, max_dist=4, prefix_chars=28).to_pandas()
    got = {(int(a), int(b)): int(d)
           for a, b, d in zip(out["doc_a"], out["doc_b"], out["dist"])}
    want = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            d = _ref_lev(texts[a][:28], texts[b][:28])
            if d <= 4:
                want[(a, b)] = d
    assert got == want
    assert (0, 1) in got and got[(0, 1)] == 4       # boundary kept
    assert (0, 2) not in got                         # one past boundary
    assert _ref_lev(texts[0][:28], texts[2][:28]) == 5


def test_banded_kernel_matches_full_dp():
    """levenshtein_batch_banded == full DP wherever dist <= k, and
    returns > k (capped k+1) elsewhere — incl. empties, unicode, and
    workspace reuse across differently-sized calls."""
    from searchengine_ray.stages.editdist import (
        banded_dist_chunked, levenshtein_batch, levenshtein_batch_banded)

    random.seed(4)
    alphabet = "abcdefg"
    A, B = [], []
    for _ in range(2000):
        s = "".join(random.choice(alphabet)
                    for _ in range(random.randint(0, 12)))
        t = list(s)
        for _ in range(random.randint(0, 6)):
            op = random.randint(0, 2)
            if op == 0 and t:
                t[random.randrange(len(t))] = random.choice(alphabet)
            elif op == 1 and t:
                del t[random.randrange(len(t))]
            else:
                t.insert(random.randint(0, len(t)), random.choice(alphabet))
        A.append(s)
        B.append("".join(t))
    A += ["", "", "abc", "日本語テスト", "abc"]
    B += ["", "abcd", "", "日本語テスロ", "abc"]
    full = levenshtein_batch(A, B)
    for k in (0, 1, 2, 4, 7):
        band = levenshtein_batch_banded(A, B, k)
        le = full <= k
        assert np.array_equal(band[le], full[le]), k
        assert (band[~le] > k).all(), k
    # chunked wrapper identical; workspace reuse at a smaller size
    band4 = levenshtein_batch_banded(A, B, 4)
    assert np.array_equal(banded_dist_chunked(A, B, 4, chunk=97), band4)
    small = levenshtein_batch_banded(A[:50], B[:50], 4)
    assert np.array_equal(small, band4[:50])


# --- record-linkage best match ------------------------------------------------


def _linkage_brute(qdf, rdf, k, bc):
    import itertools
    rows = []
    for _, q in qdf.iterrows():
        best = None
        for _, r in rdf.iterrows():
            if q["q_text"][:bc] != r["r_text"][:bc]:
                continue
            d = _ref_lev(q["q_text"], r["r_text"])
            if d <= k and (best is None or (d, r["reg_id"]) < best):
                best = (d, int(r["reg_id"]))
        if best is not None:
            rows.append((int(q["query_id"]), best[1], best[0]))
    return sorted(rows)


def test_linkage_matches_brute_force(ray_session):
    import ray.data as rd

    from searchengine_ray.stages.editdist import linkage_best_match

    rng = np.random.default_rng(31)
    words = ["alpha", "alphx", "beta", "betas", "gamma", "gamax", "delta"]
    rdf = pd.DataFrame({
        "reg_id": np.arange(40, dtype=np.int64),
        "r_text": [words[i % len(words)] + str(i // len(words))
                   for i in range(40)]})
    # queries: perturbed copies + some unmatched garbage
    qt = []
    for i in range(40):
        t = rdf["r_text"][i]
        r = rng.integers(0, 3)
        qt.append(t[:-1] if r == 0 else (t + "q" if r == 1 else t))
    qdf = pd.DataFrame({"query_id": np.arange(60, dtype=np.int64),
                        "q_text": qt + ["zzzzz" + str(i) for i in range(20)]})
    got = (linkage_best_match(rd.from_pandas(qdf).repartition(3),
                              rd.from_pandas(rdf).repartition(2),
                              max_dist=2, block_chars=3)
           .to_pandas())
    got_rows = sorted(map(tuple, got[["query_id", "match_id", "dist"]]
                          .to_numpy()))
    assert got_rows == _linkage_brute(qdf, rdf, 2, 3)
    # the garbage queries never match
    assert not (got["query_id"] >= 40).any()


def test_linkage_tie_breaks_to_smallest_registry_id(ray_session):
    import ray.data as rd

    from searchengine_ray.stages.editdist import linkage_best_match

    rdf = pd.DataFrame({"reg_id": np.array([7, 3, 9], dtype=np.int64),
                        "r_text": ["abcde", "abcde", "abcde"]})
    qdf = pd.DataFrame({"query_id": np.array([0], dtype=np.int64),
                        "q_text": ["abcdx"]})
    got = linkage_best_match(rd.from_pandas(qdf), rd.from_pandas(rdf),
                             max_dist=2, block_chars=2).to_pandas()
    assert got.iloc[0]["match_id"] == 3 and got.iloc[0]["dist"] == 1
