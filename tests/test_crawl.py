"""Crawl engine conformance: the Ray wave engine must reproduce the
single-threaded oracle's crawl ordering and final URL-seen set on the same
seed list and politeness budget (BASELINE.json:north_rule), and resume
bit-identically from a mid-crawl checkpoint."""

import os
import shutil

import pandas as pd
import pytest

from searchengine_ray.config import CrawlConfig
from searchengine_ray.pipelines.crawl_oracle import crawl_oracle
from searchengine_ray.sources.fixtures import make_store


@pytest.fixture(scope="module")
def store():
    return make_store(n_pages=80, seed=42)


def _config(store, **kw):
    defaults = dict(
        seed_urls=list(store.seeds),
        allowed_domains=("test",),
        num_gate_shards=4,
        fetch_concurrency=2,
        # 0-CPU state actors: the 4-CPU suite session creates engines
        # back-to-back; a raylet reservation leak on actor death (observed)
        # otherwise strands enough CPU that from_pandas' 1-CPU metadata
        # task deadlocks the next engine's wave.  Pure execution knob.
        state_actor_num_cpus=0,
    )
    defaults.update(kw)
    return CrawlConfig(**defaults)


@pytest.fixture(params=[0, 256], ids=["distributed", "inline"])
def inline_threshold(request):
    """Run conformance on BOTH execution paths: threshold=0 forces the
    distributed Ray Data path for every wave; 256 takes the inline
    small-wave fast path for these fixture sizes."""
    return request.param


def _run_engine(store, config):
    from searchengine_ray.pipelines.crawl import CrawlEngine

    eng = CrawlEngine(store, config)
    try:
        return eng.run()
    finally:
        eng.shutdown()


def _assert_match(result, oracle):
    got = result.crawl_order[["seq", "url_norm", "wave", "status", "decision"]]
    want = pd.DataFrame(oracle.crawl_order).rename(columns={"url": "url_norm"})[
        ["seq", "url_norm", "wave", "status", "decision"]
    ]
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype({"seq": "int64", "wave": "int64",
                                           "status": "int64"}),
        want.astype({"seq": "int64", "wave": "int64", "status": "int64"}),
    )
    assert result.url_seen == oracle.url_seen
    assert result.accepted_pages == [
        e["url"] for e in oracle.crawl_order if e["decision"] == "accept"
    ]


def test_oracle_sanity(store):
    config = _config(store)
    o = crawl_oracle(store, config)
    decisions = {e["decision"] for e in o.crawl_order}
    assert "accept" in decisions
    # planted structures must actually fire
    whys = {d["why"] for d in o.link_decisions}
    assert {"dup", "trap", "accept"} <= whys, whys
    page_decisions = [e["decision"] for e in o.crawl_order]
    assert "text_dup" in page_decisions, set(page_decisions)
    assert "image_dup" in page_decisions, set(page_decisions)
    # trap family: at most the first date page is ever fetched
    trap_fetches = [e for e in o.crawl_order if "/events/day/" in e["url"]]
    assert len(trap_fetches) <= 1
    # robots: no /private/ page fetched
    assert not any("/private/" in e["url"] for e in o.crawl_order)
    # seq are dense FIFO ranks
    seqs = sorted(e["seq"] for e in o.crawl_order)
    assert seqs == list(range(len(seqs)))


def test_engine_matches_oracle_bfs(ray_session, store, inline_threshold):
    config = _config(store, inline_wave_threshold=inline_threshold)
    res = _run_engine(store, config)
    _assert_match(res, crawl_oracle(store, config))


def test_engine_matches_oracle_budgeted(ray_session, store, inline_threshold):
    config = _config(store, per_host_wave_budget=3,
                     inline_wave_threshold=inline_threshold)
    res = _run_engine(store, config)
    _assert_match(res, crawl_oracle(store, config))


def _research_first(url, host, depth):
    """User priority function: crawl /research/ pages before others."""
    return 1.0 if "/research/" in url else 0.0


def _no_blog(url):
    """User extra is_valid rule (README.md:113-114): skip /blog/ URLs."""
    return "/blog/" not in url


def test_engine_matches_oracle_priority_queue(ray_session, store, inline_threshold):
    """Priority-queue scheduling (priority DESC, seq) must match the
    oracle's, including its effect on gate ordering and discovery seqs."""
    config = _config(store, priority_fn=_research_first, per_host_wave_budget=4,
                     inline_wave_threshold=inline_threshold)
    res = _run_engine(store, config)
    oracle = crawl_oracle(store, config)
    _assert_match(res, oracle)
    # the priority actually reorders: among wave-1+ fetches, research pages
    # of a host come before its other pages discovered at the same time
    got = res.crawl_order
    later = got[got["wave"] >= 1]
    assert any("/research/" in u for u in later["url_norm"].head(8)), \
        later["url_norm"].head(8).tolist()


def test_engine_matches_oracle_probe_tier(ray_session, store, inline_threshold):
    """The sharded content-probe tier (content_probe_shards=N) must produce
    the exact oracle crawl on both execution paths — the tier replaces the
    broadcast replica AND the monolithic gate actor, decisions unchanged."""
    config = _config(store, content_probe_shards=3,
                     inline_wave_threshold=inline_threshold)
    res = _run_engine(store, config)
    _assert_match(res, crawl_oracle(store, config))


def test_engine_matches_oracle_probe_tier_budgeted_priority(ray_session, store):
    config = _config(store, content_probe_shards=2, per_host_wave_budget=4,
                     priority_fn=_research_first, inline_wave_threshold=0)
    res = _run_engine(store, config)
    _assert_match(res, crawl_oracle(store, config))


def test_checkpoint_resume_probe_tier(ray_session, store, tmp_path):
    """Checkpoints are mode-independent: a run checkpointed under the tier
    resumes bit-identically under the tier AND under the replica mode
    (content deltas replay into whichever store exists)."""
    from searchengine_ray.pipelines.crawl import CrawlEngine

    full = _run_engine(store, _config(store, content_probe_shards=3))
    ckpt = str(tmp_path / "ckpt_tier")
    eng = CrawlEngine(store, _config(store, checkpoint_dir=ckpt, max_waves=2,
                                     content_probe_shards=3))
    eng.run()
    eng.shutdown()
    for shards in (3, None):
        eng2 = CrawlEngine.resume(store, _config(
            store, checkpoint_dir=ckpt, content_probe_shards=shards))
        res2 = eng2.run()
        eng2.shutdown()
        pd.testing.assert_frame_equal(
            full.crawl_order.reset_index(drop=True),
            res2.crawl_order.reset_index(drop=True), obj=f"shards={shards}")
        assert full.url_seen == res2.url_seen


def test_engine_matches_oracle_distributed_resolve(ray_session, store):
    """driver_fp_threshold=0 forces the GIANT-wave content resolve
    (distributed partner graph + interacting-only pull + split replay) on
    every distributed wave — decisions must stay oracle-exact, in both
    store modes (broadcast replica and probe tier)."""
    for shards in (None, 3):
        config = _config(store, inline_wave_threshold=0,
                         driver_fp_threshold=0, content_probe_shards=shards)
        res = _run_engine(store, config)
        _assert_match(res, crawl_oracle(store, config))


def test_engine_matches_oracle_distributed_resolve_budgeted(ray_session, store):
    config = _config(store, inline_wave_threshold=0, driver_fp_threshold=0,
                     per_host_wave_budget=3)
    res = _run_engine(store, config)
    _assert_match(res, crawl_oracle(store, config))


def test_checkpoint_resume_distributed_resolve(ray_session, store, tmp_path):
    """The giant-wave delta (content_delta_dir, distributed parquet write)
    must replay into a resumed engine bit-identically — resuming into
    either store mode."""
    from searchengine_ray.pipelines.crawl import CrawlEngine

    full = _run_engine(store, _config(store))
    ckpt = str(tmp_path / "ckpt_dres")
    eng = CrawlEngine(store, _config(store, checkpoint_dir=ckpt, max_waves=3,
                                     inline_wave_threshold=0,
                                     driver_fp_threshold=0))
    eng.run()
    eng.shutdown()
    for kw in ({}, {"content_probe_shards": 2},
               {"inline_wave_threshold": 0, "driver_fp_threshold": 0}):
        eng2 = CrawlEngine.resume(store, _config(store, checkpoint_dir=ckpt, **kw))
        res2 = eng2.run()
        eng2.shutdown()
        pd.testing.assert_frame_equal(
            full.crawl_order.reset_index(drop=True),
            res2.crawl_order.reset_index(drop=True), obj=str(kw))
        assert full.url_seen == res2.url_seen


def test_engine_matches_oracle_speculative_fetch(ray_session, store, inline_threshold):
    """Wave pipelining (speculative next-wave fetch) must not change any
    decision: fetch is pure, probes/gates still run in the wave proper."""
    config = _config(store, speculative_fetch=True, per_host_wave_budget=3,
                     inline_wave_threshold=inline_threshold)
    res = _run_engine(store, config)
    _assert_match(res, crawl_oracle(store, config))


def test_engine_matches_oracle_speculative_spill_priority(ray_session, store, tmp_path):
    """Speculation over the partitioned spill pool + priority queue + probe
    tier — the full 10^10-shape stack at fixture scale."""
    config = _config(store, speculative_fetch=True, per_host_wave_budget=4,
                     priority_fn=_research_first, content_probe_shards=2,
                     frontier_spill_dir=str(tmp_path / "spec_pool"),
                     frontier_partitions=3, inline_wave_threshold=0)
    res = _run_engine(store, config)
    _assert_match(res, crawl_oracle(store, config))


def test_engine_matches_oracle_extra_link_filter(ray_session, store):
    config = _config(store, extra_link_filter=_no_blog)
    res = _run_engine(store, config)
    _assert_match(res, crawl_oracle(store, config))
    assert not any("/blog/" in u for u in res.crawl_order["url_norm"])
    # and without the filter, blog pages ARE crawled (the filter is load-bearing)
    base = _run_engine(store, _config(store))
    assert any("/blog/" in u for u in base.crawl_order["url_norm"])


def test_engine_matches_oracle_max_pages(ray_session, store):
    config = _config(store, max_pages=25)
    res = _run_engine(store, config)
    oracle = crawl_oracle(store, config)
    _assert_match(res, oracle)
    assert len(res.crawl_order) == 25


def test_checkpoint_resume_bit_identical(ray_session, store, tmp_path):
    from searchengine_ray.pipelines.crawl import CrawlEngine

    ckpt = str(tmp_path / "ckpt")
    full_cfg = _config(store, checkpoint_dir=None)
    full = _run_engine(store, full_cfg)

    # run 2 waves, "kill", resume from checkpoint, finish
    part_cfg = _config(store, checkpoint_dir=ckpt, max_waves=2)
    eng = CrawlEngine(store, part_cfg)
    eng.run()
    eng.shutdown()

    resumed_cfg = _config(store, checkpoint_dir=ckpt)
    eng2 = CrawlEngine.resume(store, resumed_cfg)
    res2 = eng2.run()
    eng2.shutdown()

    pd.testing.assert_frame_equal(
        full.crawl_order.reset_index(drop=True),
        res2.crawl_order.reset_index(drop=True),
    )
    assert full.url_seen == res2.url_seen

    # a torn wave must not corrupt resume: manifest is written last, so
    # deleting post-manifest artifacts of the NEXT wave is a no-op here —
    # just verify the manifest guards config drift
    bad_cfg = _config(store, checkpoint_dir=ckpt, content_max_similarity=0.5)
    with pytest.raises(ValueError):
        CrawlEngine.resume(store, bad_cfg)
    # shard-count drift is also guarded (seen-set dumps are shard-local)
    bad_shards = _config(store, checkpoint_dir=ckpt, num_gate_shards=8)
    with pytest.raises(ValueError, match="shard"):
        CrawlEngine.resume(store, bad_shards)


def test_engine_matches_oracle_distributed_append(ray_session, store, tmp_path):
    """Force the fully distributed frontier append (prefix-sum seq
    assignment + streamed pool add) on every wave — ordering must still be
    bit-identical to the oracle, with and without a priority_fn."""
    for kw in ({}, {"priority_fn": _research_first, "per_host_wave_budget": 4}):
        config = _config(store, inline_wave_threshold=0,
                         driver_link_threshold=0,
                         frontier_spill_dir=str(tmp_path / "fp_da"),
                         frontier_partitions=3, **kw)
        res = _run_engine(store, config)
        _assert_match(res, crawl_oracle(store, config))


def test_engine_matches_oracle_spill_pool(ray_session, store, tmp_path):
    """The host-hash-partitioned parquet frontier pool must reproduce the
    oracle exactly (slice semantics identical to the in-memory pool)."""
    config = _config(store, per_host_wave_budget=3,
                     frontier_spill_dir=str(tmp_path / "fpool"),
                     frontier_partitions=5)
    res = _run_engine(store, config)
    _assert_match(res, crawl_oracle(store, config))


def test_engine_matches_oracle_spill_pool_priority(ray_session, store, tmp_path):
    config = _config(store, priority_fn=_research_first, per_host_wave_budget=4,
                     frontier_spill_dir=str(tmp_path / "fpool_prio"),
                     frontier_partitions=3)
    res = _run_engine(store, config)
    _assert_match(res, crawl_oracle(store, config))


def test_checkpoint_resume_spill_pool(ray_session, store, tmp_path):
    """Checkpoint written by the spill pool resumes bit-identically — into a
    spill pool AND into the in-memory pool (the snapshot layout is
    pool-independent)."""
    from searchengine_ray.pipelines.crawl import CrawlEngine

    full = _run_engine(store, _config(store))
    ckpt = str(tmp_path / "ckpt_spill")
    eng = CrawlEngine(store, _config(
        store, checkpoint_dir=ckpt, max_waves=2,
        frontier_spill_dir=str(tmp_path / "sp1"), frontier_partitions=4))
    eng.run()
    eng.shutdown()

    for kw in ({"frontier_spill_dir": str(tmp_path / "sp2"),
                "frontier_partitions": 4}, {}):
        eng2 = CrawlEngine.resume(store, _config(store, checkpoint_dir=ckpt, **kw))
        res2 = eng2.run()
        eng2.shutdown()
        pd.testing.assert_frame_equal(
            full.crawl_order.reset_index(drop=True),
            res2.crawl_order.reset_index(drop=True))
        assert full.url_seen == res2.url_seen


def test_resume_with_priority_queue(ray_session, store, tmp_path):
    """Priority scheduling must survive checkpoint/resume (the pool's
    priority column round-trips; the seq order stays bit-identical)."""
    from searchengine_ray.pipelines.crawl import CrawlEngine

    ckpt = str(tmp_path / "ckpt_prio")
    cfg_kw = dict(priority_fn=_research_first, per_host_wave_budget=4)
    full = _run_engine(store, _config(store, **cfg_kw))

    eng = CrawlEngine(store, _config(store, checkpoint_dir=ckpt, max_waves=3, **cfg_kw))
    eng.run()
    eng.shutdown()
    eng2 = CrawlEngine.resume(store, _config(store, checkpoint_dir=ckpt, **cfg_kw))
    res2 = eng2.run()
    eng2.shutdown()
    pd.testing.assert_frame_equal(full.crawl_order.reset_index(drop=True),
                                  res2.crawl_order.reset_index(drop=True))


def test_pages_table_readback(ray_session, store, tmp_path):
    """The persisted pages table must contain exactly the accepted pages
    with valid payloads (image_id content-addressing, phash integrity)."""
    import glob
    from hashlib import sha256 as _sha

    import pyarrow.parquet as pq

    from searchengine_ray.functions.imagecodec import decode as _dec
    from searchengine_ray.functions.phash import phash64 as _ph
    from searchengine_ray.pipelines.crawl import CrawlEngine

    ckpt = str(tmp_path / "ckpt_pages")
    eng = CrawlEngine(store, _config(store, checkpoint_dir=ckpt))
    res = eng.run()
    eng.shutdown()

    files = sorted(glob.glob(os.path.join(ckpt, "pages", "wave=*", "*.parquet")))
    tables = [pq.read_table(f) for f in files if os.path.getsize(f) > 0]
    import pyarrow as pa2

    pages = pa2.concat_tables(tables)
    assert sorted(pages["url_norm"].to_pylist()) == sorted(res.accepted_pages)
    for i in range(min(20, pages.num_rows)):
        blob = pages["bytes"][i].as_py()
        fmt = pages["fmt"][i].as_py()
        assert pages["image_id"][i].as_py() == _sha(blob).hexdigest()
        px = _dec(blob, fmt)
        assert _ph(px) == pages["phash"][i].as_py()
        assert px.shape[1] == pages["w"][i].as_py()


def test_larger_store_conformance(ray_session):
    """400-page universe: trap families, near-dups and skew at 5× the base
    fixture — the oracle is brute-force, the engine is not."""
    big = make_store(n_pages=400, seed=11)
    config = CrawlConfig(seed_urls=list(big.seeds), allowed_domains=("test",),
                         num_gate_shards=4, fetch_concurrency=4,
                         per_host_wave_budget=25, state_actor_num_cpus=0)
    res = _run_engine(big, config)
    _assert_match(res, crawl_oracle(big, config))


def test_messy_seed_variants(ray_session, store):
    """Seeds that are hash-duplicates of each other (scheme/slash/fragment
    variants) collapse to one frontier entry, exactly as the oracle's."""
    u = store.seeds[0]
    messy = [u, u + "/", u.replace("https://", "http://"), u + "#frag",
             store.seeds[1]]
    config = _config(store, max_waves=2)
    config.seed_urls = messy
    res = _run_engine(store, config)
    oracle = crawl_oracle(store, config)
    _assert_match(res, oracle)
    assert (res.crawl_order["wave"] == 0).sum() == 2  # two distinct seeds


@pytest.mark.parametrize("fuzz_seed,knobs", [
    (101, dict(n_pages=150, n_hosts=3, fanout=8, frac_near_dup_caption=0.3,
               frac_near_dup_image=0.2, frac_dead=0.2, trap_len=12)),
    (202, dict(n_pages=200, n_hosts=10, fanout=2, frac_near_dup_caption=0.02,
               frac_near_dup_image=0.02, frac_dead=0.02)),
    (303, dict(n_pages=120, n_hosts=2, fanout=6, frac_near_dup_caption=0.5,
               frac_near_dup_image=0.0, frac_dead=0.0)),
])
def test_conformance_fuzz(ray_session, fuzz_seed, knobs):
    """Randomized universes with extreme dup/trap/dead fractions — engine
    vs oracle on ordering + URL-seen set, budgeted and unbudgeted."""
    fuzz_store = make_store(seed=fuzz_seed, **knobs)
    for budget, pf, lf in ((None, None, None), (7, None, None),
                           (5, _research_first, _no_blog)):
        config = CrawlConfig(seed_urls=list(fuzz_store.seeds),
                             allowed_domains=("test",), num_gate_shards=3,
                             fetch_concurrency=2, per_host_wave_budget=budget,
                             priority_fn=pf, extra_link_filter=lf,
                             state_actor_num_cpus=0)
        res = _run_engine(fuzz_store, config)
        _assert_match(res, crawl_oracle(fuzz_store, config))


def test_resume_survives_torn_wave(ray_session, store, tmp_path):
    """A crash mid-wave leaves partial post-manifest artifacts; resume must
    ignore them and still reproduce the full run bit-identically."""
    import numpy as np
    import pyarrow as pq_pa
    import pyarrow.parquet as pq

    from searchengine_ray.pipelines.crawl import CrawlEngine

    ckpt = str(tmp_path / "ckpt")
    full = _run_engine(store, _config(store))

    eng = CrawlEngine(store, _config(store, checkpoint_dir=ckpt, max_waves=2))
    eng.run()
    eng.shutdown()

    # simulate the torn wave the manifest never acknowledged: garbage in
    # wave-3 artifact locations
    torn_pages = os.path.join(ckpt, "pages", "wave=2.tmp")
    os.makedirs(torn_pages, exist_ok=True)
    with open(os.path.join(torn_pages, "part-0.parquet"), "wb") as f:
        f.write(b"not parquet")
    pq.write_table(
        pq_pa.table({"seq": pq_pa.array(np.array([999], dtype=np.int64))}),
        os.path.join(ckpt, "crawl_order", "wave=2.parquet.tmp"),
    )

    eng2 = CrawlEngine.resume(store, _config(store, checkpoint_dir=ckpt))
    res2 = eng2.run()
    eng2.shutdown()
    pd.testing.assert_frame_equal(
        full.crawl_order.reset_index(drop=True),
        res2.crawl_order.reset_index(drop=True),
    )
    assert full.url_seen == res2.url_seen


def test_resume_at_every_boundary(ray_session, store, tmp_path):
    """Kill-and-resume at several wave boundaries; every resumed run must
    equal the uninterrupted crawl bit-for-bit."""
    from searchengine_ray.pipelines.crawl import CrawlEngine

    full = _run_engine(store, _config(store))
    for cut in (1, 3, 5):
        ckpt = str(tmp_path / f"ckpt_{cut}")
        eng = CrawlEngine(store, _config(store, checkpoint_dir=ckpt, max_waves=cut))
        eng.run()
        eng.shutdown()
        eng2 = CrawlEngine.resume(store, _config(store, checkpoint_dir=ckpt))
        res2 = eng2.run()
        eng2.shutdown()
        pd.testing.assert_frame_equal(
            full.crawl_order.reset_index(drop=True),
            res2.crawl_order.reset_index(drop=True), obj=f"cut={cut}")
        assert full.url_seen == res2.url_seen, cut


def test_politeness_pacing(ray_session, store):
    """With one fetch actor and a delay, same-host fetches must be spaced."""
    import time

    from searchengine_ray.pipelines.crawl import CrawlEngine

    config = _config(store, politeness_delay=0.05, fetch_concurrency=1,
                     max_waves=2)
    t0 = time.monotonic()
    eng = CrawlEngine(store, config)
    eng.run()
    fetched = sum(m["fetched"] for m in eng.metrics)
    elapsed = time.monotonic() - t0
    eng.shutdown()
    # at least (n-1) spacing intervals for the dominant host must have passed
    assert elapsed >= 0.05 * 2, (elapsed, fetched)


def test_procedural_store_matches_oracle(ray_session):
    """The procedural (URL-derived) fetch backend must produce the same
    crawl as the oracle run over the materialized page dict."""
    from searchengine_ray.pipelines.crawl import CrawlEngine
    from searchengine_ray.sources.fixtures import (
        ProceduralSpec,
        ProceduralStore,
        SyntheticStore,
        procedural_page,
    )

    spec = ProceduralSpec(n_pages=300, n_hosts=4, chunk=32, img_edge=24, seed=9)
    pstore = ProceduralStore(spec)
    config = CrawlConfig(seed_urls=list(pstore.seeds), allowed_domains=("test",),
                         num_gate_shards=4, fetch_concurrency=2,
                         state_actor_num_cpus=0)
    eng = CrawlEngine(pstore, config)
    try:
        res = eng.run()
    finally:
        eng.shutdown()

    mat = SyntheticStore()
    for i in range(spec.n_pages):
        url = spec.url(i)
        mat.pages[url] = procedural_page(spec, url)
    mat.seeds = list(pstore.seeds)
    oracle = crawl_oracle(mat, config)
    _assert_match(res, oracle)
    assert len(res.crawl_order) == spec.n_pages  # hub topology reaches all


def test_politeness_actor_path_matches_oracle(ray_session, store):
    """politeness_delay > 0 switches fetch to the pacing actor pool; the
    crawl must still match the oracle exactly (pacing never reorders)."""
    config = _config(store, politeness_delay=0.002, fetch_concurrency=2,
                     inline_wave_threshold=0, max_waves=3)
    res = _run_engine(store, config)
    oracle = crawl_oracle(store, _config(store, max_waves=3))
    _assert_match(res, oracle)


def test_fixture_payload_invariants(store):
    """FIXTURES.md F1: decode round-trip vs originals, PSNR≥40 for lossy,
    caption + phash stability."""
    import numpy as np

    from searchengine_ray.functions.imagecodec import decode, psnr
    from searchengine_ray.functions.phash import phash64

    for url, rec in list(store.pages.items())[:40]:
        px = decode(rec["bytes"], rec["fmt"])
        orig = store.originals[url]
        assert px.shape == orig.shape
        if rec["fmt"] == "png":
            np.testing.assert_array_equal(px, orig)
        else:
            assert psnr(orig, px) >= 40.0
        assert phash64(px) == rec["phash"]
        assert isinstance(rec["caption"], str) and rec["caption"]


def test_resume_restores_decision_counters(ray_session, store, tmp_path):
    """The per-partition dedup-rate lineage (gate decision counters) must
    survive a checkpoint/resume: a resumed crawl's final counters equal a
    straight-through run's — not a since-resume view (dump_delta carries
    the cumulative snapshot; restore_replay applies the last one)."""
    import ray as _ray

    from searchengine_ray.pipelines.crawl import CrawlEngine

    def counters(eng):
        stats = _ray.get([g.memory_stats.remote() for g in eng.gates])
        return [s["decisions"] for s in stats]

    eng_full = CrawlEngine(store, _config(store))
    eng_full.run()
    full_dec = counters(eng_full)
    eng_full.shutdown()
    assert sum(d["accept"] + d["dup"] + d["trap"] for d in full_dec) > 0

    ckpt = str(tmp_path / "ckpt_dec")
    eng = CrawlEngine(store, _config(store, checkpoint_dir=ckpt, max_waves=2))
    eng.run()
    eng.shutdown()
    eng2 = CrawlEngine.resume(store, _config(store, checkpoint_dir=ckpt))
    eng2.run()
    res_dec = counters(eng2)
    eng2.shutdown()
    assert res_dec == full_dec


def test_shutdown_returns_state_actor_cpu_reservation(ray_session, store):
    """shutdown must WAIT until the raylet's available CPU actually rises
    by the engine's state-actor reservation (actor death and resource
    release are separate events; a leak here deadlocks 1-CPU Ray Data
    tasks on small sessions — the r4 suite-hang root cause).  Uses the
    DEFAULT (non-zero) reservations, unlike every other test here."""
    import time as _time

    import ray as _ray

    from searchengine_ray.pipelines.crawl import CrawlEngine

    # one engine's default reservation (4×0.5 + 0.5 + 0.25 = 2.75) fits
    # the 4-CPU fixture; quiesce first so the baseline is stable
    deadline = _time.monotonic() + 30
    while (_ray.available_resources().get("CPU", 0.0) < 3.9
           and _time.monotonic() < deadline):
        _time.sleep(0.2)
    before = _ray.available_resources().get("CPU", 0.0)
    cfg = _config(store, max_waves=1)
    cfg = type(cfg)(**{**cfg.__dict__, "state_actor_num_cpus": None})
    eng = CrawlEngine(store, cfg)
    assert eng._actor_cpu_reserved == 2.75
    eng.run()
    eng.shutdown()
    after = _ray.available_resources().get("CPU", 0.0)
    assert after >= before - 0.01, (before, after)
