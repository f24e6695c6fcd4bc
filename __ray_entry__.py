"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``: flagship pipeline on /root/testdata/sf0.001.
- ``queries()``: one callable per implemented operator/pipeline
  (SURVEY.md §2); each takes ``sf_dir``.
- ``oracle_sql()``: DuckDB-equivalent SQL for each SQL-expressible query —
  152 of 156, including every near-dup family (verified MinHash ≡ exact
  all-pairs jaccard; embedding LSH ≡ all-pairs cosine; simhash / phash /
  audio fingerprints ≡ bit_count(xor) over engine-materialized scratch
  tables), the image/audio/video pipelines (golden-table TRUE-flag
  gates), the iterative algorithms (kmeans / pagerank / LPA communities /
  MMR gated via engine-persisted state + generated unrolled rounds) and
  the Count-Min sketch (gated via its own one-sided ε-bound).  Only
  crawl_bfs (stateful sequential gates), bpe_stats (iterative merge
  training), distinct_users_hll and event_value_quantiles_sketch
  (approximate by design, error-bounded) stay rows-only; their semantics
  are pinned by the pytest conformance suites.

``QUERIES`` dict order is the certification rotation: entries without a
prior driver-green CORRECTNESS row lead, so the driver's ~50-entry window
certifies new operators each round.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: the north-rule crawl — frontier waves with politeness,
    seen-set/trap/near-dup gates and payload validation — over a
    deterministic image+caption web graph whose captions are the sf0.001
    ``documents`` texts.  Returns the crawl_order table (seq, url_norm,
    wave, status, decision)."""
    import pyarrow.parquet as pq

    from searchengine_ray.config import CrawlConfig
    from searchengine_ray.pipelines.crawl import CrawlEngine
    from searchengine_ray.sources.fixtures import make_store

    texts = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["text"]
    )["text"].to_pylist()
    store = make_store(n_pages=100, seed=42, captions=texts)
    config = CrawlConfig(seed_urls=list(store.seeds), allowed_domains=("test",),
                         num_gate_shards=4, fetch_concurrency=4,
                         # driver-shared session: 0-CPU state actors so a
                         # raylet reservation leak can't starve Ray Data
                         state_actor_num_cpus=0)
    eng = CrawlEngine(store, config)
    try:
        res = eng.run()
    finally:
        eng.shutdown()
    return res.crawl_order


def queries() -> dict[str, Callable[[str], Any]]:
    from searchengine_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from searchengine_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
