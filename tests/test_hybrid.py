"""rrf_fuse unit semantics — hand-computed + naive-reference checks.

The hybrid_search oracle gate (SQL_HYBRID_SEARCH) proves the composed
pipeline; these pin the fusion kernel itself: rank sentinels, absent-list
contributions, rounding, and the (rrf desc, id) tiebreak.
"""

import numpy as np
import pandas as pd
import pytest

from searchengine_ray.pipelines.search import rrf_fuse


def _naive_rrf(ranked, k, c=60):
    scores, ranks = {}, {}
    for name, df in ranked.items():
        for pos, d in enumerate(df["doc_id"], start=1):
            scores[d] = scores.get(d, 0.0) + 1.0 / (c + pos)
            ranks.setdefault(d, {})[name] = pos
    rows = [{"doc_id": d,
             **{f"{n}_rank": ranks[d].get(n, 0) for n in ranked},
             "rrf": round(scores[d], 6)} for d in scores]
    rows.sort(key=lambda r: (-r["rrf"], r["doc_id"]))
    return rows[:k]


def test_hand_case_absent_and_tiebreak():
    sparse = pd.DataFrame({"doc_id": [5, 3, 9]})     # ranks 1,2,3
    dense = pd.DataFrame({"doc_id": [3, 7]})         # ranks 1,2
    out = rrf_fuse({"sparse": sparse, "dense": dense}, k=10)
    got = {r.doc_id: r for r in out.itertuples()}
    # doc 3: 1/62 + 1/61; doc 5: 1/61 only; doc 7: 1/62 only; doc 9: 1/63
    assert got[3].rrf == round(1 / 62 + 1 / 61, 6)
    assert got[3].sparse_rank == 2 and got[3].dense_rank == 1
    assert got[5].sparse_rank == 1 and got[5].dense_rank == 0  # sentinel
    assert got[7].sparse_rank == 0 and got[7].dense_rank == 2
    assert list(out["doc_id"]) == [3, 5, 7, 9]  # fused order
    assert out["sparse_rank"].dtype == np.int64
    assert out["dense_rank"].dtype == np.int64


def test_symmetric_ranks_tie_breaks_by_id():
    # (sr=1, dr=2) vs (sr=2, dr=1) — identical rrf sums, id must decide
    a = pd.DataFrame({"doc_id": [10, 4]})
    b = pd.DataFrame({"doc_id": [4, 10]})
    out = rrf_fuse({"a": a, "b": b}, k=2)
    assert list(out["doc_id"]) == [4, 10]
    assert out["rrf"].nunique() == 1


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_naive_reference(seed):
    rng = np.random.default_rng(seed)
    lists = {
        name: pd.DataFrame(
            {"doc_id": rng.permutation(100)[:rng.integers(5, 40)]})
        for name in ("sparse", "dense", "third")
    }
    out = rrf_fuse(lists, k=15)
    want = _naive_rrf(lists, k=15)
    assert len(out) == len(want)
    for row, w in zip(out.itertuples(), want):
        assert row.doc_id == w["doc_id"]
        assert row.rrf == w["rrf"]
        for n in lists:
            assert getattr(row, f"{n}_rank") == w[f"{n}_rank"]


def test_k_truncation_and_single_list():
    one = pd.DataFrame({"doc_id": list(range(30))})
    out = rrf_fuse({"only": one}, k=10)
    assert len(out) == 10
    # single list: fused order == input rank order
    assert list(out["doc_id"]) == list(range(10))
    assert list(out["only_rank"]) == list(range(1, 11))
