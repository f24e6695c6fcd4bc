"""searchengine_ray — a Ray-Data-native crawl/frontier + indexing engine.

A from-scratch re-expression of the query/data-processing capabilities of the
reference crawler+search-engine (xKimChip/searchengine, snapshot at
/root/reference) as idiomatic Ray Data pipelines: ``ray.data.Dataset`` →
``map_batches`` over zero-copy Arrow batches, actor pools for stateful stages,
``groupby``/``aggregate``/``sort`` for the wide steps.

Layout
------
- ``utils``     : URL canonicalization / hashing (reference ``utils/__init__.py``)
- ``functions`` : pure kernels — tokenizer, n-gram shingles, link similarity,
                  simhash/minhash, phash, image codec, text stats
- ``stages``    : Ray Data batch transforms built from the kernels
- ``state``     : long-lived actors (sharded URL-seen set, gates, robots cache)
- ``sources``   : storage layer (Lance-or-parquet) + deterministic fixtures
- ``pipelines`` : end-to-end pipelines (crawl waves, tf-idf index, query)

None of these modules call ``ray.init()`` — the caller owns the Ray session.
"""

__version__ = "0.1.0"
