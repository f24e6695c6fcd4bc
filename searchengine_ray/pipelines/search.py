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
    (score desc, doc_id asc)."""
    groups = [g for g in parse_query(query) if g]
    if not groups:
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "score": pd.Series([], dtype=np.float64)})
    all_terms = sorted({t for g in groups for t in g})

    # J1: broadcast-semi-join of the term list against postings
    terms_set = set(all_terms)
    slice_df = postings.map_batches(
        lambda df: df[df["token"].isin(terms_set)],
        batch_format="pandas",
    ).select_columns(["doc_id", "token", "tf_idf"]).to_pandas()

    if slice_df.empty:
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "score": pd.Series([], dtype=np.float64)})

    per_doc = slice_df.drop_duplicates(["doc_id", "token"])
    doc_tokens = per_doc.groupby("doc_id")["token"].agg(set)

    qualifying: set[int] = set()
    for g in groups:  # D1/D2: AND within group, OR across groups
        need = set(g)
        qualifying.update(
            int(d) for d, toks in doc_tokens.items() if need <= toks
        )
    scored = (
        per_doc[per_doc["doc_id"].isin(qualifying)]
        .groupby("doc_id", as_index=False)["tf_idf"].sum()
        .rename(columns={"tf_idf": "score"})
    )
    scored["score"] = scored["score"].round(6)
    return (
        scored.sort_values(["score", "doc_id"], ascending=[False, True])
        .head(k).reset_index(drop=True)
    )
