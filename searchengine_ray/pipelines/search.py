"""Boolean query retrieval over the tf-idf postings table.

Re-expression of the reference query path (retrieve_query.py):
- query parse: OR-of-AND term lists, 'AND' skipped, 'OR' splits, lowercased
  (retrieve_query.py:89-111);
- AND = posting-set intersection keyed by doc_id (D1, :46-54 — note the
  reference seeds the intersection from an empty set, which always yields
  {} — a listed bug; the INTENDED semantics, implemented here, is docs
  containing ALL terms of the group);
- OR  = union of AND-group results (D2, :134-142);
- ranking by tf_idf DESCENDING (the reference sorts ascending at :54,142 —
  also a listed bug; intent per SURVEY.md §7 is descending), doc score =
  sum of tf_idf over the distinct query terms present in the doc;
- top-k = MAX_LINKS_SHOWN = 5 (:14,186-187).

The postings probe is a broadcast-semi-join of the tiny term list against
the postings Dataset (J1) — no shuffle of the postings table; the per-doc
qualification (J3/D1) is ``groupby(doc_id)`` over the filtered slice only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset

MAX_LINKS_SHOWN = 5  # reference retrieve_query.py:14


def parse_query(query: str) -> list[list[str]]:
    """retrieve_query.py:89-111 semantics."""
    groups: list[list[str]] = []
    cur: list[str] = []
    for tok in query.split():
        if tok == "AND":
            continue
        if tok == "OR":
            groups.append(cur)
            cur = []
        else:
            cur.append(tok.lower())
    groups.append(cur)
    return groups


def boolean_search(
    postings: Dataset, query: str, k: int = MAX_LINKS_SHOWN
) -> pd.DataFrame:
    """Returns (doc_id, score) — top-k docs matching the OR-of-AND query,
    score = sum of tf_idf over distinct query terms in the doc, ranked
    (score desc, doc_id asc).

    Fully distributed: the term probe is a broadcast-semi filter (J1), the
    per-doc AND/OR qualification (J3/D1/D2) co-shuffles the term-sliced
    postings on doc_id and resolves each bucket with ONE vectorized
    bitmask pass (query terms → bits; distinct rows ⇒ grouped bit-SUM ==
    bit-OR), and the ranked result reduces through ``global_topk`` — the
    driver never holds the term slice (a stop-word query term at corpus
    scale would be unbounded there)."""
    from searchengine_ray.stages.relational import bucketed_apply, global_topk

    empty = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                          "score": pd.Series([], dtype=np.float64)})
    groups = [g for g in parse_query(query) if g]
    if not groups:
        return empty
    all_terms = sorted({t for g in groups for t in g})
    term_bit = {t: 1 << i for i, t in enumerate(all_terms)}
    group_masks = np.array(
        [np.bitwise_or.reduce([term_bit[t] for t in g]) for g in groups],
        dtype=np.int64)

    # J1: broadcast-semi-join of the (tiny) term list against postings
    terms_set = set(all_terms)
    sliced = postings.map_batches(
        lambda df: df[df["token"].isin(terms_set)],
        batch_format="pandas",
    ).select_columns(["doc_id", "token", "tf_idf"])

    def qualify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["doc_id", "token"])
        bits = g["token"].map(term_bit).to_numpy(dtype=np.int64)
        agg = (pd.DataFrame({"doc_id": g["doc_id"].to_numpy(),
                             "bit": bits,
                             "tf": g["tf_idf"].to_numpy(np.float64)})
               .groupby("doc_id", as_index=False)
               .agg(mask=("bit", "sum"), score=("tf", "sum")))
        # each bit appears ≤ once per doc (distinct rows) ⇒ sum == OR
        mask = agg["mask"].to_numpy(dtype=np.int64)
        qual = np.zeros(len(agg), dtype=bool)
        for gm in group_masks:  # D1/D2: AND within group, OR across groups
            qual |= (mask & gm) == gm
        out = agg[qual][["doc_id", "score"]].copy()
        out["score"] = out["score"].round(6)
        return out

    scored = bucketed_apply(sliced, ["doc_id"], qualify)
    out = global_topk(scored, ["score", "doc_id"], [False, True], k)
    if out.empty or "doc_id" not in out.columns:
        return empty
    return out.reset_index(drop=True)
