"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``: flagship pipeline on /root/testdata/sf0.001.
- ``queries()``: one callable per implemented operator/pipeline
  (SURVEY.md §2); each takes ``sf_dir``.
- ``oracle_sql()``: DuckDB-equivalent SQL for each SQL-expressible query;
  non-SQL-expressible ops (LSH dedup candidates, feature scoring, crawl)
  are omitted → rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: build the tf-idf postings index over sf0.001 documents
    (the Ray-Data re-expression of the reference indexer,
    index_construction.py:146-250)."""
    import ray.data as rd

    from searchengine_ray.pipelines.queries import q_tfidf_top

    _ = rd  # driver initialised Ray already
    return q_tfidf_top("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from searchengine_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from searchengine_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
