"""End-to-end inverted-index pipeline: build → persist → load → query.

Ray-Data re-expression of the reference indexer entry point
(index_construction.py:146-250) + the spill-variant writers/loader
(S4-S7 of SURVEY.md §2.1):

- build: docs → tokenize (reference semantics incl. tag weighting when an
  HTML column is present) → postings with tf/weight/tf_idf → global sort
  by token (O1, index_construction.py:215-216);
- persist: token-sorted parquet/Lance, partitioned in row groups so a term
  probe reads only matching row groups; plus a doc_id→url map table (S6,
  idxer.py:192-193) and an analytics summary (A4-A6,
  index_construction.py:246-250);
- load: ``load_postings(path, terms)`` pushes the term filter into the
  read (J1 — filter pushdown replaces the unpickle-everything loader at
  retrieve_query.py:18-35).

The partial-index spill + merge the reference never finished
(idxer.py:125-164, SURVEY.md §7 bug 7) falls out of Ray's shuffle: the
sort IS the merge.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd
from ray.data import Dataset

from searchengine_ray.functions.html import extract_tag_texts, extract_text
from searchengine_ray.functions.tokenizer import calculate_term_weights, term_frequencies, tokenize_fast
from searchengine_ray.stages import text as text_stage


def build_postings(
    docs: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "reference",
    html: bool = False,
) -> Dataset:
    """docs → (doc_id, token, tf, weight, tf_idf) postings.

    ``mode='reference'`` uses the full reference tokenizer (apostrophes,
    10k cap, lemmatizer); ``html=True`` treats ``text_col`` as raw HTML:
    text extraction per M1 and additive tag weights per M4
    (helpers.py:31-47) populate ``weight`` (else 1.0)."""
    if not html:
        postings = text_stage.tfidf_postings(docs, mode=mode, round_to=None)

        def add_weight(df: pd.DataFrame) -> pd.DataFrame:
            df["weight"] = 1.0
            return df[["doc_id", "token", "tf", "weight", "tf_idf"]]

        return postings.map_batches(add_weight, batch_format="pandas")

    # HTML path: extract text + tag weights in one pass per doc
    class HtmlTokenize:
        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            ids, toks, tfs, weights, lens = [], [], [], [], []
            for doc_id, raw in zip(df[id_col].to_numpy(), df[text_col]):
                body = extract_text(raw or "")
                tokens = tokenize_fast(body)
                tf = term_frequencies(tokens)
                tw = calculate_term_weights(extract_tag_texts(raw or ""), tf)
                for t, f in tf.items():
                    ids.append(doc_id)
                    toks.append(t)
                    tfs.append(f)
                    weights.append(tw.get(t, 1.0))
                    lens.append(len(tokens))
            return pd.DataFrame({
                "doc_id": np.array(ids, dtype=np.int64), "token": toks,
                "tf": np.array(tfs), "weight": np.array(weights),
            })

    tfw = docs.map_batches(HtmlTokenize, batch_format="pandas",
                           batch_size=512, concurrency=(1, 8)).materialize()
    n_docs = docs.count()
    # df/idf over the (doc, token) rows; idf table broadcast (A1-A3)
    from searchengine_ray.stages.relational import pre_aggregate

    df_tbl = pre_aggregate(tfw, ["token"], {"df": (None, "count")}).to_pandas()
    idf = {t: float(np.log(n_docs / d)) for t, d in zip(df_tbl["token"], df_tbl["df"])}
    import ray

    idf_ref = ray.put(idf)

    def mul(dfr: pd.DataFrame) -> pd.DataFrame:
        table = ray.get(idf_ref)
        dfr["tf_idf"] = dfr["tf"].to_numpy() * np.array([table[t] for t in dfr["token"]])
        return dfr[["doc_id", "token", "tf", "weight", "tf_idf"]]

    return tfw.map_batches(mul, batch_format="pandas")


def write_index(
    postings: Dataset, out_dir: str, docs: Dataset | None = None,
    id_col: str = "doc_id", url_col: str = "url",
) -> dict:
    """Persist the token-sorted index (S5) + doc map (S6) + analytics
    (A4-A6).  Row groups are token-ordered → a term probe touches only the
    row groups whose [min,max] token range covers it."""
    os.makedirs(out_dir, exist_ok=True)
    sorted_ds = postings.sort("token")  # O1 global sort (range shuffle)
    idx_dir = os.path.join(out_dir, "postings")
    tmp = idx_dir + ".tmp"
    import shutil

    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    sorted_ds.write_parquet(tmp, min_rows_per_file=200_000)
    os.makedirs(tmp, exist_ok=True)
    if os.path.exists(idx_dir):
        shutil.rmtree(idx_dir)
    os.replace(tmp, idx_dir)

    if docs is not None:
        doc_map = docs.select_columns([id_col, url_col]) if url_col else None
        if doc_map is not None:
            dm_dir = os.path.join(out_dir, "doc_map")
            tmp = dm_dir + ".tmp"
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            doc_map.write_parquet(tmp)
            os.makedirs(tmp, exist_ok=True)
            if os.path.exists(dm_dir):
                shutil.rmtree(dm_dir)
            os.replace(tmp, dm_dir)

    # analytics (reference index_construction.py:246-250)
    files = [os.path.join(idx_dir, f) for f in os.listdir(idx_dir)]
    n_postings = 0
    size_kb = 0.0
    for f in files:
        md = pq.read_metadata(f)
        n_postings += md.num_rows
        size_kb += os.path.getsize(f) / 1024
    uniq = pq.read_table(idx_dir, columns=["token"])
    n_unique = pc.count_distinct(uniq["token"]).as_py()
    summary = {
        "n_postings": int(n_postings),
        "n_unique_tokens": int(n_unique),  # A5
        "index_size_kb": round(size_kb, 1),  # A6
    }
    from searchengine_ray.sources import storage

    storage.write_json_atomic(summary, os.path.join(out_dir, "summary.json"))
    return summary


def load_postings(out_dir: str, terms: list[str] | None = None) -> Dataset:
    """Index loader with term-filter pushdown (S7/J1).  ``terms=None``
    loads everything; else only row groups containing the terms are read."""
    idx_dir = os.path.join(out_dir, "postings")
    if terms is None:
        return rd.read_parquet(idx_dir)
    if not terms:  # empty probe: typed empty set (isin([]) binds as null)
        return rd.read_parquet(idx_dir, filter=pc.field("token") == "")
    expr = pc.field("token").isin(terms)
    return rd.read_parquet(idx_dir, filter=expr)


def search_index(out_dir: str, query: str, k: int = 5) -> pd.DataFrame:
    """Query path against the persisted index: parse → pushdown probe →
    boolean AND/OR → rank (reference retrieve_query.py flow, bugs fixed
    per SURVEY.md §7)."""
    from searchengine_ray.pipelines.search import boolean_search, parse_query

    terms = sorted({t for g in parse_query(query) for t in g})
    if not terms:
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "score": pd.Series([], dtype=np.float64)})
    postings = load_postings(out_dir, terms)
    result = boolean_search(postings, query, k)
    dm_dir = os.path.join(out_dir, "doc_map")
    if os.path.isdir(dm_dir) and len(result):
        dm = pq.read_table(dm_dir).to_pandas()
        result = result.merge(dm, on="doc_id", how="left")  # J2 dereference
    return result
