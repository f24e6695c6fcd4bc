"""Index build/persist/load/query conformance (F5 micro-corpus with
hand-computed tf/idf; reference formulas helpers.py:21-27,
index_construction.py:191-194,204)."""

import math

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from searchengine_ray.pipelines.index_pipeline import (
    build_postings,
    load_postings,
    search_index,
    write_index,
)
from searchengine_ray.pipelines.search import boolean_search, parse_query

# F5: 3 tiny docs, values hand-computed.
# doc0: "cat cat dog"      → tf(cat)=2/3, tf(dog)=1/3
# doc1: "dog bird"         → tf(dog)=1/2, tf(bird)=1/2
# doc2: "fish"             → tf(fish)=1
# df: cat=1 dog=2 bird=1 fish=1 ; N=3
# idf: cat=ln(3) dog=ln(1.5) bird=ln(3) fish=ln(3)
DOCS = pd.DataFrame({
    "doc_id": [0, 1, 2],
    "text": ["cat cat dog", "dog bird", "fish"],
    "url": ["u0", "u1", "u2"],
})


@pytest.fixture()
def postings(ray_session):
    return build_postings(rd.from_pandas(DOCS), mode="simple").to_pandas()


def test_tf_idf_golden(postings):
    p = postings.set_index(["doc_id", "token"])
    assert math.isclose(p.loc[(0, "cat"), "tf"], 2 / 3)
    assert math.isclose(p.loc[(0, "dog"), "tf"], 1 / 3)
    assert math.isclose(p.loc[(1, "bird"), "tf"], 0.5)
    assert math.isclose(p.loc[(0, "cat"), "tf_idf"], (2 / 3) * math.log(3))
    assert math.isclose(p.loc[(0, "dog"), "tf_idf"], (1 / 3) * math.log(3 / 2))
    assert math.isclose(p.loc[(2, "fish"), "tf_idf"], math.log(3))
    assert (postings["weight"] == 1.0).all()


def test_parse_query():
    # reference retrieve_query.py:89-111
    assert parse_query("a AND b OR c d") == [["a", "b"], ["c", "d"]]
    assert parse_query("Hello") == [["hello"]]
    assert parse_query("x OR") == [["x"], []]


def test_boolean_search_semantics(ray_session):
    postings = build_postings(rd.from_pandas(DOCS), mode="simple")
    # AND: both terms required (the reference's empty-seed bug is FIXED —
    # SURVEY.md §7 bug list: retrieve_query.py:48-54 always returned {})
    r = boolean_search(postings, "cat AND dog")
    assert r["doc_id"].tolist() == [0]
    # OR of groups
    r = boolean_search(postings, "cat OR fish")
    assert set(r["doc_id"]) == {0, 2}
    # ranking DESCENDING by summed tf_idf (ascending-sort bug fixed)
    r = boolean_search(postings, "dog OR fish")
    assert r["doc_id"].tolist()[0] == 2  # fish doc scores ln(3) > dog scores
    # no hits
    assert len(boolean_search(postings, "unicorn")) == 0


def test_write_load_search_roundtrip(ray_session, tmp_path):
    out = str(tmp_path / "idx")
    docs = rd.from_pandas(DOCS)
    postings = build_postings(docs, mode="simple")
    summary = write_index(postings, out, docs=docs)
    assert summary["n_unique_tokens"] == 4  # A5
    assert summary["n_postings"] == 5  # (0,cat)(0,dog)(1,dog)(1,bird)(2,fish)
    assert summary["index_size_kb"] > 0  # A6

    # pushdown loader returns only probed terms (J1/S7)
    probe = load_postings(out, ["dog"]).to_pandas()
    assert set(probe["token"]) == {"dog"}
    assert set(probe["doc_id"]) == {0, 1}

    # full query path with doc_map dereference (J2)
    r = search_index(out, "cat AND dog")
    assert r["doc_id"].tolist() == [0]
    assert r["url"].tolist() == ["u0"]
    # top-k cap = 5 (MAX_LINKS_SHOWN, retrieve_query.py:14)
    r = search_index(out, "cat OR dog OR bird OR fish")
    assert len(r) <= 5


def test_html_weighted_postings(ray_session):
    html_docs = pd.DataFrame({
        "doc_id": [0],
        "text": ["<html><title>cat story</title><body>cat cat dog</body></html>"],
    })
    p = build_postings(rd.from_pandas(html_docs), html=True).to_pandas()
    p = p.set_index("token")
    # 'cat' appears in <title> → weight 3 (helpers.py:7-19); body-only
    # words keep weight 1
    assert math.isclose(p.loc["cat", "weight"], 3.0)
    assert math.isclose(p.loc["dog", "weight"], 1.0)
    assert math.isclose(p.loc["story", "weight"], 3.0)
    assert np.isclose(p.loc["cat", "tf"], 3 / 5)


def test_merge_index_equals_rebuild(ray_session, tmp_path):
    """Incremental merge ≡ from-scratch rebuild of the merged corpus:
    replaced docs drop their old postings, new docs append, and every
    surviving posting's tf_idf is rescaled to the merged-corpus idf."""
    from searchengine_ray.pipelines.index_pipeline import merge_index

    base = pd.DataFrame({
        "doc_id": np.array([0, 1, 2], dtype=np.int64),
        "text": ["cat dog", "dog bird", "cat cat fish"],
        "url": ["u0", "u1", "u2"],
    })
    # delta: doc 1 CHANGES, doc 3 is NEW
    delta = pd.DataFrame({
        "doc_id": np.array([1, 3], dtype=np.int64),
        "text": ["bird bird snail", "cat snail"],
        "url": ["u1b", "u3"],
    })
    final = pd.concat([base[base.doc_id != 1], delta], ignore_index=True)

    out = str(tmp_path / "idx")
    write_index(build_postings(rd.from_pandas(base), mode="simple"), out,
                docs=rd.from_pandas(base))
    summary = merge_index(out, rd.from_pandas(delta), mode="simple",
                          url_col="url")

    merged = (load_postings(out).to_pandas()
              .sort_values(["doc_id", "token"]).reset_index(drop=True))
    rebuilt = (build_postings(rd.from_pandas(final), mode="simple")
               .to_pandas()
               .sort_values(["doc_id", "token"]).reset_index(drop=True))
    assert merged[["doc_id", "token"]].equals(rebuilt[["doc_id", "token"]])
    assert np.allclose(merged["tf"], rebuilt["tf"])
    assert np.allclose(merged["tf_idf"], rebuilt["tf_idf"])
    assert summary["n_postings"] == len(rebuilt)

    # doc map: replaced id 1 now maps to the delta's url
    r = search_index(out, "snail")
    assert set(r["doc_id"]) == {1, 3}
    assert set(r["url"]) == {"u1b", "u3"}


def test_merge_index_removal_via_empty_text(ray_session, tmp_path):
    """Removal contract: an empty-text delta row REPLACES a doc with zero
    postings — the doc vanishes from the index, its tokens' df drop, and
    n_docs bookkeeping excludes it (the fast-path delta-scale arithmetic
    must not count a removed id as a surviving doc)."""
    from searchengine_ray.pipelines.index_pipeline import merge_index

    base = pd.DataFrame({
        "doc_id": np.array([0, 1, 2, 3], dtype=np.int64),
        "text": ["cat dog", "dog bird", "cat fish", "bird cat"],
    })
    # remove doc 1, change doc 2, add doc 4
    delta = pd.DataFrame({
        "doc_id": np.array([1, 2, 4], dtype=np.int64),
        "text": ["", "fish fish", "dog snail"],
    })
    final = pd.DataFrame({
        "doc_id": np.array([0, 2, 3, 4], dtype=np.int64),
        "text": ["cat dog", "fish fish", "bird cat", "dog snail"],
    })

    out = str(tmp_path / "idx")
    write_index(build_postings(rd.from_pandas(base), mode="simple"), out)
    summary = merge_index(out, rd.from_pandas(delta), mode="simple")

    merged = (load_postings(out).to_pandas()
              .sort_values(["doc_id", "token"]).reset_index(drop=True))
    rebuilt = (build_postings(rd.from_pandas(final), mode="simple")
               .to_pandas()
               .sort_values(["doc_id", "token"]).reset_index(drop=True))
    assert merged[["doc_id", "token"]].equals(rebuilt[["doc_id", "token"]])
    assert np.allclose(merged["tf_idf"], rebuilt["tf_idf"])
    assert 1 not in set(merged["doc_id"])          # removed id gone
    assert summary["n_docs"] == 4                   # 0,2,3,4 — not 5
