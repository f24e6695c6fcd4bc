"""Crawl configuration (the Ray-native analog of reference config.ini /
utils/config.py:4-19).

Reference knobs → fields:
- SEEDURL         → ``seed_urls``
- POLITENESS      → ``politeness_delay`` (seconds between fetches to one host)
- SAVE            → ``checkpoint_dir`` (Lance/parquet checkpoints, §S8)
- THREADCOUNT     → subsumed by ``fetch_concurrency`` (actor-pool size)
plus the gate thresholds (link_similarity.py:12, ngrams.py:11,14) and the
graft's phash near-dup threshold.
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Callable
from dataclasses import asdict, dataclass, field


@dataclass
class CrawlConfig:
    seed_urls: list[str] = field(default_factory=list)
    allowed_domains: tuple[str, ...] | None = None

    # user-extension surface (reference §2.10: pluggable scraper/is_valid,
    # README.md:58-114 + frontier policy):
    # - priority_fn(url, host, depth) -> float: frontier ordering — each
    #   wave processes pending URLs by (priority DESC, discovery seq);
    #   None = pure FIFO (the reference default posture)
    # - extra_link_filter(url) -> bool: additional is_valid rules
    #   (README.md:113-114 "Additional rules should be added to is_valid")
    # Both must be picklable; both are part of crawl semantics but can't be
    # hashed — resuming a checkpoint with DIFFERENT callables is undefined
    # (the manifest records whether each was set).
    priority_fn: Callable[[str, str, int], float] | None = None
    extra_link_filter: Callable[[str], bool] | None = None

    # politeness / scheduling
    politeness_delay: float = 0.0  # seconds per host between fetches
    per_host_wave_budget: int | None = None  # None = full BFS wave
    max_waves: int | None = None
    max_pages: int | None = None

    # gates (reference thresholds)
    url_similarity_threshold: float = 0.85  # link_similarity.py:12
    content_max_similarity: float = 0.65  # ngrams.py:11
    ngram_size: int = 3  # ngrams.py:14
    phash_max_hamming: int = 4  # graft near-dup threshold (FIXTURES.md F1)
    use_robots: bool = True

    # execution
    inline_wave_threshold: int = 64  # waves ≤ this run driver-inline (same kernels)
    num_gate_shards: int = 8
    # content-store probe tier: None = per-worker broadcast StoreIndex
    # replica (lowest latency; O(corpus) memory per worker — fine to ~10^7
    # pages); N = shard the accepted-fingerprint index across N probe
    # actors at O(corpus/N) each, probed by batch RPC from the fetch tasks
    # (the 10^10 shape).  Pure execution knob — decisions are identical.
    content_probe_shards: int | None = None
    # wave size above which the content-gate resolve runs DISTRIBUTED
    # (shared-shingle / shared-band co-shuffle partner graph + pull of only
    # the interacting pages) instead of concatenating the wave's
    # fingerprints on the driver.  ~3 extra all-to-alls per wave — pure
    # overhead below the threshold, the only shape that works above it.
    driver_fp_threshold: int = 100_000
    # wave pipelining: speculatively fetch+validate the PREDICTED next wave
    # (the frontier backlog's next slice — exact in budget-bound steady
    # state, a subset during frontier expansion) while the current wave's
    # gate/link/frontier stages run.  Fetch is pure (decode/phash/shingle;
    # no store probe, no gate state), so decisions are identical; results
    # are keyed by seq and consumed by whichever wave the seq lands in.
    # Auto-disabled when politeness_delay > 0 (speculation would break the
    # per-host pacing clock).
    speculative_fetch: bool = False
    fetch_concurrency: int = 8
    fetch_batch_size: int = 256
    checkpoint_dir: str | None = None
    # accepted-link volume above which frontier(w+1) seq assignment and
    # pool append run DISTRIBUTED (per-parent prefix-sum rank + streamed
    # add) instead of on the driver: the distributed path costs ~3 extra
    # all-to-all stages per wave — pure overhead for small waves, the only
    # shape that works for giant ones
    driver_link_threshold: int = 200_000
    # upper bound on links per fetched page, used ONLY by the size-routing
    # guard (wave_pages × this ≤ driver_link_threshold ⇒ the wave's gate
    # frame provably fits on the driver).  The synthetic stores emit ≤ 64
    # links/page; a higher-fanout corpus must raise this or big waves will
    # collect oversized frames on the driver (memory hazard, not
    # correctness — both routes are conformance-identical)
    max_links_per_page: int = 64
    # frontier pool storage: None = driver-side pandas (small crawls);
    # a directory = host-hash-partitioned parquet spill pool (the 10^10-URL
    # shape — the driver holds one partition at a time, never the pool)
    frontier_spill_dir: str | None = None
    frontier_partitions: int = 16
    # False + checkpoint_dir: per-wave crawl_order lands only on disk and
    # result() reads it back — driver heap stays flat across waves
    hold_order_in_memory: bool = True
    # CPU reservation override for the engine's STATE actors (gate shards,
    # content gate / probe tier, robots cache).  None = the class defaults
    # (0.5 / 0.25 — sized so a multi-node scheduler spreads the state tier
    # instead of packing it on the head node).  Small shared sessions that
    # create engines back-to-back (the test fixture, driver dryrun) should
    # pass 0: a raylet resource-accounting leak on actor death (worker goes
    # IDLE but its reservation is never returned — observed live) can
    # otherwise strand enough CPU that Ray Data's 1-CPU tasks (e.g.
    # from_pandas metadata) become permanently infeasible and the next
    # engine's wave materialize hangs.  Pure execution knob — decisions are
    # identical.
    state_actor_num_cpus: float | None = None

    def config_hash(self) -> str:
        """Identity of the semantic knobs — a checkpoint is only resumable
        under the same semantics."""
        d = asdict(self)
        # excluded: execution knobs and stop conditions — ``max_waves`` is
        # "when this invocation stops" (≈ a kill), not per-wave semantics;
        # ``max_pages`` stays in: it truncates wave slices deterministically.
        for k in ("num_gate_shards", "fetch_concurrency", "fetch_batch_size",
                  "checkpoint_dir", "max_waves", "politeness_delay",
                  "inline_wave_threshold", "frontier_spill_dir",
                  "frontier_partitions", "hold_order_in_memory",
                  "driver_link_threshold", "max_links_per_page",
                  "content_probe_shards", "driver_fp_threshold",
                  "speculative_fetch", "state_actor_num_cpus"):
            d.pop(k)
        # callables aren't hashable: record presence only (see field docs)
        d["priority_fn"] = self.priority_fn is not None
        d["extra_link_filter"] = self.extra_link_filter is not None
        return hashlib.sha256(json.dumps(d, sort_keys=True, default=str).encode()).hexdigest()[:16]
