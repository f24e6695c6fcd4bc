"""The Ray-Data-native crawl engine: iterative waves of frontier expansion.

Each wave is a bounded Ray Data pipeline (SURVEY.md §3.3):

    frontier slice (budgeted per host)
      → fetch          map_batches(Fetcher actor pool)   [politeness pacing]
      → validate       map_batches: decode image, enforce per-row invariants,
                       caption shingles + phash fingerprints
      → content gate   ContentGate actor (sequential by seq — exact
                       reference semantics via inverted shingle index +
                       pigeonhole phash bands)
      → pages sink     accepted payload rows → wave-partitioned table
      → link explode   map_batches: resolve/defrag/is_valid/canonicalize
      → robots filter  RobotsCache actor → broadcast rules
      → host gate      groupby(host).map_groups → HostGateShard actors
                       (exact URL dedup + trap similarity, in discovery order)
      → frontier(w+1)  accepted candidates, FIFO seq assigned

Determinism/ordering contract: the engine reproduces the single-threaded
reference FIFO exactly — ``crawl_order`` sorted by (wave, seq) equals the
oracle's (pipelines/crawl_oracle.py), because every order-dependent decision
runs in discovery order inside the gates while all heavy work (fetch,
decode, hashing, link parsing) is freely parallel.

Scale notes (10^10-URL frontier):
- the frontier pool is pluggable (state/frontier.py): the default driver
  pandas pool for small crawls, or the host-hash-partitioned parquet spill
  pool (``config.frontier_spill_dir``) where the driver holds at most one
  partition transiently — slice semantics are identical and both run under
  the conformance suite.  At full scale the FIFO seq assignment becomes the
  standard distributed rank: sort by (parent_seq, link_idx) →
  per-partition counts → exclusive prefix sum → per-partition offset add.
  The per-wave dataflow is unchanged.
- the content gate is one logical actor here (exact conformance mode); the
  documented scale mode shards it by LSH band with a two-phase
  accept/confirm, trading a bounded semantic delta for parallelism.
- host-gate shards scale horizontally: URL similarity is 0 across hosts
  (link_similarity.py:106-112), so per-host state never crosses shards.
- skew: the wave slice caps ``per_host_wave_budget`` URLs per host per wave,
  so a 58%-of-corpus host (BASELINE.md) cannot dominate a wave; fetch actors
  additionally pace per host (token interval = politeness_delay).
"""

from __future__ import annotations

import os
import shutil
import time
import zlib
from hashlib import sha256

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from searchengine_ray.config import CrawlConfig
from searchengine_ray.functions.imagecodec import decode
from searchengine_ray.functions.ngrams import shingle_hashes
from searchengine_ray.functions.phash import phash64
from searchengine_ray.functions.tokenizer import tokenize_fast
from searchengine_ray.sources import storage
from searchengine_ray.sources.fixtures import (
    ProceduralSpec,
    ProceduralStore,
    SyntheticStore,
    procedural_page,
)
from searchengine_ray.state.gates import (
    ContentGate, ContentProbeShard, HostGateShard, RobotsCache)
from searchengine_ray.utils.urls import is_valid, join_url, normalize, urldefrag_str

_EMPTY = b""

# checkpoint layout version: 2 = per-wave incremental deltas (hostgate admit
# deltas + content-fp deltas, replayed in order on resume); 1 was the
# round-1 full-dump layout, which this engine can no longer read
_CHECKPOINT_FORMAT = 2


def _host_shard(host: str, num_shards: int) -> int:
    return zlib.crc32(host.encode("utf-8")) % num_shards


def _driver_rss_mb() -> float | None:
    """Current driver resident set (MB) from /proc — per-wave lineage for
    the flat-RSS invariant of the spill-pool path."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return round(int(line.split()[1]) / 1024, 1)
    except OSError:
        pass
    return None


def _driver_private_mb() -> float | None:
    """Private (non-shared) resident MB — excludes mapped plasma/shm
    segments, i.e. the driver's OWN heap.  This is the number that must
    stay flat when the frontier lives off-driver (VmRSS also counts
    object-store pages the driver merely mapped)."""
    try:
        with open("/proc/self/smaps_rollup") as f:
            total = 0
            for line in f:
                if line.startswith(("Private_Clean:", "Private_Dirty:")):
                    total += int(line.split()[1])
            return round(total / 1024, 1)
    except OSError:
        return None


# Per-worker-process cache of broadcast objects: ray.get() re-deserializes a
# Python dict on every call, so stateless fetch tasks memoize it once per
# worker (the actor-pool path gets the same amortization via __init__).
# BOUNDED + LRU: per-wave objects (rank maps) would otherwise accumulate in
# every worker for the life of the crawl; LRU (refresh on hit) keeps the
# long-lived store ref resident while per-wave refs cycle through.
from collections import OrderedDict

_BROADCAST_CACHE: OrderedDict[str, object] = OrderedDict()
_BROADCAST_CACHE_MAX = 8


def _get_broadcast(ref):
    key = ref.hex()
    if key in _BROADCAST_CACHE:
        _BROADCAST_CACHE.move_to_end(key)
        return _BROADCAST_CACHE[key]
    while len(_BROADCAST_CACHE) >= _BROADCAST_CACHE_MAX:
        _BROADCAST_CACHE.popitem(last=False)
    obj = ray.get(ref)
    _BROADCAST_CACHE[key] = obj
    return obj


def store_to_arrow(pages: dict[str, dict]) -> tuple[pa.Table, dict[str, int]]:
    """Page store → (Arrow table, url→row index).  The table lives in the
    object store ONCE; workers map it zero-copy (binary payload buffers are
    not re-deserialized per task, unlike a Python dict)."""
    urls = list(pages)
    recs = [pages[u] for u in urls]
    table = pa.table({
        "url": pa.array(urls, pa.string()),
        "status": pa.array([int(r["status"]) for r in recs], pa.int32()),
        "caption": pa.array([r["caption"] for r in recs], pa.string()),
        "bytes": pa.array([r["bytes"] for r in recs], pa.binary()),
        "w": pa.array([int(r["w"]) for r in recs], pa.int32()),
        "h": pa.array([int(r["h"]) for r in recs], pa.int32()),
        "fmt": pa.array([r["fmt"] for r in recs], pa.string()),
        "phash": pa.array([int(r["phash"]) for r in recs], pa.int64()),
        "links": pa.array([list(r["links"]) for r in recs], pa.list_(pa.string())),
    })
    return table, {u: i for i, u in enumerate(urls)}


class Fetcher:
    """Fetch stage: synthetic page-store lookup standing in for the HTTP
    client (reference utils/download.py:7-21).  Reads the broadcast store
    once (zero-copy Arrow) and keeps a per-host politeness clock — the
    token-bucket analog of the reference's per-thread sleep
    (README.md:202-203)."""

    def __init__(self, store_ref, delay: float):
        obj = ray.get(store_ref) if isinstance(store_ref, ray.ObjectRef) else store_ref
        if isinstance(obj, ProceduralSpec):
            self.spec, self.table, self.index = obj, None, None
        else:
            self.spec = None
            self.table, self.index = obj
        self.delay = delay
        self.last_fetch: dict[str, float] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url_norm"].to_pylist()
        hosts = batch["host"].to_pylist()
        if self.delay > 0:
            for host in hosts:
                now = time.monotonic()
                wait = self.last_fetch.get(host, -1e18) + self.delay - now
                if wait > 0:
                    time.sleep(wait)
                self.last_fetch[host] = time.monotonic()
        if self.spec is not None:
            return self._call_procedural(batch, urls)
        rows = [self.index.get(u, -1) for u in urls]
        present = [i for i in rows if i >= 0]
        sub = self.table.take(pa.array(present, pa.int64()))
        # per-batch columns from the store slice; missing rows → 404 shells
        cols = {c: sub[c].to_pylist() for c in
                ("status", "caption", "bytes", "w", "h", "fmt", "phash", "links")}
        j = 0
        out = {k: [] for k in cols}
        for i in rows:
            if i < 0:
                out["status"].append(404)
                out["caption"].append("")
                out["bytes"].append(_EMPTY)
                out["w"].append(0)
                out["h"].append(0)
                out["fmt"].append("")
                out["phash"].append(0)
                out["links"].append([])
            else:
                ok = cols["status"][j] == 200
                out["status"].append(cols["status"][j])
                out["caption"].append(cols["caption"][j] if ok else "")
                out["bytes"].append(cols["bytes"][j] if ok else _EMPTY)
                out["w"].append(cols["w"][j] if ok else 0)
                out["h"].append(cols["h"][j] if ok else 0)
                out["fmt"].append(cols["fmt"][j] if ok else "")
                out["phash"].append(cols["phash"][j] if ok else 0)
                out["links"].append(cols["links"][j] if ok else [])
                j += 1
        return self._emit(batch, out)

    def _call_procedural(self, batch: pa.Table, urls: list[str]) -> pa.Table:
        out = {k: [] for k in ("status", "caption", "bytes", "w", "h", "fmt",
                               "phash", "links")}
        for u in urls:
            page = procedural_page(self.spec, u)
            if page is None:
                out["status"].append(404)
                out["caption"].append("")
                out["bytes"].append(_EMPTY)
                out["w"].append(0)
                out["h"].append(0)
                out["fmt"].append("")
                out["phash"].append(0)
                out["links"].append([])
            else:
                for k in out:
                    out[k].append(page[k])
        return self._emit(batch, out)

    @staticmethod
    def _emit(batch: pa.Table, out: dict) -> pa.Table:
        return pa.table({
            "seq": batch["seq"],
            "url_norm": batch["url_norm"],
            "host": batch["host"],
            "wave": batch["wave"],
            "status": pa.array(out["status"], pa.int32()),
            "caption": pa.array(out["caption"], pa.string()),
            "bytes": pa.array(out["bytes"], pa.binary()),
            "w": pa.array(out["w"], pa.int32()),
            "h": pa.array(out["h"], pa.int32()),
            "fmt": pa.array(out["fmt"], pa.string()),
            "phash": pa.array(out["phash"], pa.int64()),
            "links": pa.array(out["links"], pa.list_(pa.string())),
        })


def _validate_batch(batch: pa.Table, ngram_size: int) -> pa.Table:
    """Decode + per-row invariant enforcement (BASELINE.json:input_hint):
    decoded dims must match (w, h), recomputed phash must equal the carried
    phash (decoded-pixel integrity), caption present.  Emits the caption
    shingle fingerprints and content-addressed image_id."""
    n = batch.num_rows
    statuses = batch["status"].to_pylist()
    fmts = batch["fmt"].to_pylist()
    blobs = batch["bytes"].to_pylist()
    ws = batch["w"].to_pylist()
    hs = batch["h"].to_pylist()
    phs = batch["phash"].to_pylist()
    caps = batch["caption"].to_pylist()
    ok = np.zeros(n, dtype=bool)
    image_ids = []
    shingles = []
    for i in range(n):
        if statuses[i] != 200:
            image_ids.append("")
            shingles.append([])
            continue
        try:
            px = decode(blobs[i], fmts[i])
            valid = (
                px.shape[0] == hs[i]
                and px.shape[1] == ws[i]
                and phash64(px) == phs[i]
                and caps[i] is not None
            )
        except Exception:
            valid = False
        ok[i] = valid
        image_ids.append(sha256(blobs[i]).hexdigest() if valid else "")
        shingles.append(
            sorted(shingle_hashes(tokenize_fast(caps[i]), ngram_size)) if valid else []
        )
    return (
        batch.append_column("integrity_ok", pa.array(ok))
        .append_column("image_id", pa.array(image_ids, pa.string()))
        .append_column("shingles", pa.array(shingles, pa.list_(pa.int64())))
    )


def _explode_links(batch: pa.Table, allowed_domains, rank_map: dict[int, int],
                   extra_filter=None) -> pa.Table:
    """Accepted page → candidate link rows with PROCESSING-order keys
    (reference M10/M9/M6-M8 in one pass).  ``rank_map`` maps page seq →
    this wave's processing rank (= seq order under FIFO; priority order
    when a priority_fn is set); ``extra_filter`` is the user's additional
    is_valid rule (README.md:113-114)."""
    from searchengine_ray.utils.urls import get_urlhash

    parents = batch["seq"].to_pylist()
    urls = batch["url_norm"].to_pylist()
    links = batch["links"].to_pylist()
    o_rank, o_parent, o_idx, o_url, o_hash, o_host = [], [], [], [], [], []
    for parent_seq, page_url, lst in zip(parents, urls, links):
        rank = rank_map[parent_seq]
        for idx, raw in enumerate(lst or []):
            resolved = normalize(urldefrag_str(join_url(page_url, raw)))
            if not is_valid(resolved, allowed_domains):
                continue
            if extra_filter is not None and not extra_filter(resolved):
                continue
            o_rank.append(rank)
            o_parent.append(parent_seq)
            o_idx.append(idx)
            o_url.append(resolved)
            o_hash.append(get_urlhash(resolved))
            o_host.append(resolved.split("/")[2])
    return pa.table({
        "parent_rank": pa.array(o_rank, pa.int64()),
        "parent_seq": pa.array(o_parent, pa.int64()),
        "link_idx": pa.array(o_idx, pa.int32()),
        "url_norm": pa.array(o_url, pa.string()),
        "url_hash": pa.array(o_hash, pa.string()),
        "host": pa.array(o_host, pa.string()),
    })


def _robots_filter_table(b: pa.Table, rules: dict) -> pa.Table:
    """Drop rows whose URL path starts with a disallowed prefix for its
    host.  Vectorized: the loop runs over the (few) per-host prefix RULES,
    each applied as one pandas str.startswith over that host's rows."""
    active = {h: p for h, p in rules.items() if p}
    if not active or b.num_rows == 0:
        return b
    u = b["url_norm"].to_pandas()
    h = b["host"].to_pandas()
    # path = everything from the 3rd "/" on ("/" when the URL has no path)
    path = ("/" + u.str.split("/", n=3).str[3].fillna("")).to_numpy(dtype=object)
    drop = np.zeros(len(u), dtype=bool)
    for host, prefixes in active.items():
        m = (h == host).to_numpy()
        if not m.any():
            continue
        sub = pd.Series(path[m])
        d = np.zeros(int(m.sum()), dtype=bool)
        for p in prefixes:
            d |= sub.str.startswith(p).to_numpy()
        drop[m] |= d
    return b.filter(pa.array(~drop))


@ray.remote
def _spec_fetch_validate(store, tbl: pa.Table, ngram_size: int) -> pa.Table:
    """Speculative fetch+validate of PREDICTED next-wave rows (wave
    pipelining).  Pure data work — decode, phash, shingles; no store probe,
    no gate state — so running it early cannot change any decision; output
    rows are keyed by seq and consumed by whichever wave the seq lands in."""
    f = Fetcher(store, 0.0)
    return _validate_batch(f(tbl), ngram_size)


def _empty_gate_frame() -> pd.DataFrame:
    return pd.DataFrame(
        columns=["parent_rank", "parent_seq", "link_idx", "url_norm", "url_hash", "host",
                 "occurrences", "decision"]
    )


_CAND_KEY = ["url_hash", "url_norm"]


def _dedup_candidates(df: pd.DataFrame) -> pd.DataFrame:
    """Collapse repeated candidate URLs to their first occurrence (by
    discovery order) + an occurrence count.

    EXACT — and the collapse key must be (url_hash, url_norm), NOT the
    hash alone: the scheme-less hash (utils/__init__.py:25-30) maps
    http/https variants to one hash, but the trap gate is scheme-SENSITIVE
    (link_similarity.py:106-112).  A trap-rejected https candidate leaves
    the hash unseen, and its http sibling must then be gated on its own
    URL string.  For IDENTICAL strings the derivation is safe: first
    accept/dup ⇒ later 'dup' (hash admitted/seen); first trap ⇒ later
    'trap' (gate state unchanged, is_trap monotone)."""
    if df.empty:
        return df.assign(occurrences=pd.Series([], dtype=np.int64))
    df = df.sort_values(["parent_rank", "link_idx"], kind="stable")
    occ = df.groupby(_CAND_KEY, sort=False).size().rename("occurrences").reset_index()
    firsts = df.drop_duplicates(_CAND_KEY, keep="first").merge(occ, on=_CAND_KEY)
    firsts["occurrences"] = firsts["occurrences"].astype(np.int64)
    return firsts.sort_values(["parent_rank", "link_idx"], kind="stable")


def _link_decision_counts(gate_res: pd.DataFrame) -> dict:
    """Reconstruct per-occurrence decision counts from the deduped gate
    output (see _dedup_candidates)."""
    if gate_res.empty:
        return {}
    occ = gate_res["occurrences"].astype(np.int64)
    dec = gate_res["decision"]
    n_accept = int((dec == "accept").sum())
    n_dup = int(occ[dec.isin(["accept", "dup"])].sum()) - n_accept
    n_trap = int(occ[dec == "trap"].sum())
    out = {"accept": n_accept}
    if n_dup:
        out["dup"] = n_dup
    if n_trap:
        out["trap"] = n_trap
    return out


def _gate_counts_distributed(gated) -> tuple[int, dict]:
    """(total candidate occurrences, per-occurrence decision counts) from
    the distributed gate output — per-batch partials, only a handful of
    count rows reach the driver (same arithmetic as
    ``_link_decision_counts``)."""
    cols = ["cand", "accept", "accept_dup_occ", "trap_occ"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(columns=cols, dtype=np.int64)
        occ = df["occurrences"].to_numpy(dtype=np.int64)
        dec = df["decision"]
        return pd.DataFrame([{
            "cand": int(occ.sum()),
            "accept": int((dec == "accept").sum()),
            "accept_dup_occ": int(occ[dec.isin(["accept", "dup"]).to_numpy()].sum()),
            "trap_occ": int(occ[(dec == "trap").to_numpy()].sum()),
        }])[cols]

    parts = gated.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return 0, {}
    t = parts.sum()
    n_accept = int(t["accept"])
    n_dup = int(t["accept_dup_occ"]) - n_accept
    n_trap = int(t["trap_occ"])
    out = {"accept": n_accept}
    if n_dup:
        out["dup"] = n_dup
    if n_trap:
        out["trap"] = n_trap
    return int(t["cand"]), out


class CrawlResult:
    """Crawl outcome HANDLE — constructing one is O(shards) on the driver:
    per-wave order frames *or* a parquet directory, the per-shard seen-hash
    spill the gate actors wrote themselves, per-shard counts, and metrics.
    Nothing O(crawl) is concatenated or unioned at result time (the
    reference never loads its save file whole either — README.md:166-173).

    Scale consumers use the streaming forms: ``crawl_order_dataset()`` /
    ``seen_hashes_dataset()`` (Ray Datasets over the partitioned tables),
    ``url_seen_count`` and ``shard_seen_counts``.  The eager views
    (``crawl_order`` frame, ``url_seen`` set, ``accepted_pages`` list) are
    LAZY cached properties for small-crawl/test convenience — accessing one
    is an explicit O(crawl)-on-the-driver choice."""

    def __init__(self, *, order_frames: list[pd.DataFrame] | None = None,
                 order_dir: str | None = None, num_waves: int = 0,
                 seen_dir: str | None = None,
                 shard_seen_counts: list[int] | None = None,
                 metrics: list[dict] | None = None,
                 pages_dir: str | None = None):
        self._order_frames = order_frames
        self._order_dir = order_dir
        self._num_waves = num_waves
        self.seen_dir = seen_dir
        self.shard_seen_counts = list(shard_seen_counts or [])
        self.metrics = metrics or []
        self.pages_dir = pages_dir
        self._order: pd.DataFrame | None = None
        self._seen: set[str] | None = None

    # ---- streaming forms (the scale API) ---------------------------------
    @property
    def url_seen_count(self) -> int:
        return int(sum(self.shard_seen_counts))

    def _order_paths(self) -> list[str]:
        return [storage.table_uri(os.path.join(self._order_dir, f"wave={wv}"))
                for wv in range(self._num_waves)
                if storage.exists(os.path.join(self._order_dir, f"wave={wv}"))]

    def crawl_order_dataset(self) -> "rd.Dataset":
        """The (seq, url_norm, wave, rank, status, decision) log as a Ray
        Dataset — reads the per-wave partitioned tables when the order lives
        on disk, so no wave ever concatenates on the driver."""
        if self._order_frames is not None:
            return rd.from_pandas(
                pd.concat(self._order_frames, ignore_index=True)
                if self._order_frames else _empty_order_frame())
        paths = self._order_paths()
        if not paths:
            return rd.from_pandas(_empty_order_frame())
        return rd.read_parquet(paths)

    def seen_hashes_dataset(self) -> "rd.Dataset":
        """The final URL-seen set as a Ray Dataset over the per-shard
        tables the gate actors spilled (one sorted table per shard)."""
        empty = pd.DataFrame({"url_hash": pd.Series([], dtype=str)})
        if not self.seen_dir or not os.path.isdir(self.seen_dir):
            return rd.from_pandas(empty)
        files = [os.path.join(self.seen_dir, f)
                 for f in sorted(os.listdir(self.seen_dir))
                 if f.endswith(".parquet") or f.endswith(".lance")]
        return rd.read_parquet(files) if files else rd.from_pandas(empty)

    # ---- eager views (small-crawl/test convenience) ----------------------
    @property
    def crawl_order(self) -> pd.DataFrame:
        if self._order is None:
            if self._order_frames is not None:
                frames = self._order_frames
            else:
                frames = [storage.read_table(
                    os.path.join(self._order_dir, f"wave={wv}")).to_pandas()
                    for wv in range(self._num_waves)
                    if storage.exists(os.path.join(self._order_dir, f"wave={wv}"))]
            self._order = (
                pd.concat(frames, ignore_index=True)
                .sort_values(["wave", "rank"]).reset_index(drop=True)
                if frames else pd.DataFrame()
            )
        return self._order

    @property
    def url_seen(self) -> set[str]:
        if self._seen is None:
            if not self.seen_dir:
                self._seen = set()
            else:
                tbl = self.seen_hashes_dataset().to_pandas()
                self._seen = set(tbl["url_hash"]) if len(tbl) else set()
        return self._seen

    @property
    def accepted_pages(self) -> list[str]:
        order = self.crawl_order
        return (order[order["decision"] == "accept"]["url_norm"].tolist()
                if len(order) else [])


def _empty_order_frame() -> pd.DataFrame:
    return pd.DataFrame({
        "seq": pd.Series([], dtype=np.int64),
        "url_norm": pd.Series([], dtype=str),
        "wave": pd.Series([], dtype=np.int32),
        "rank": pd.Series([], dtype=np.int64),
        "status": pd.Series([], dtype=np.int32),
        "decision": pd.Series([], dtype=str)})


class CrawlEngine:
    """Wave-loop driver.  Owns the gate actors and the frontier pool."""

    def __init__(self, store: SyntheticStore, config: CrawlConfig,
                 _restore: dict | None = None):
        self.config = config
        self.store = store
        if isinstance(store, ProceduralStore):
            self.store_ref = ray.put(store.spec)
        else:
            self.store_ref = ray.put(store_to_arrow(store.pages))
        # state-actor CPU reservations: class defaults, or the config
        # override (0 on small shared sessions — see CrawlConfig docs).
        # Track the total actually reserved so shutdown can verify the
        # raylet gave it back (leaked reservations strand Ray Data tasks).
        sac = config.state_actor_num_cpus
        self._actor_cpu_reserved = 0.0

        def _cls(klass, default_cpus):
            self._actor_cpu_reserved += default_cpus if sac is None else sac
            return klass if sac is None else klass.options(num_cpus=sac)

        self.gates = [
            _cls(HostGateShard, 0.5).remote(
                i, config.url_similarity_threshold,
                track_deltas=config.checkpoint_dir is not None)
            for i in range(config.num_gate_shards)
        ]
        if config.content_probe_shards:
            # sharded probe tier (O(corpus/N) per actor) replaces BOTH the
            # monolithic gate actor and the per-worker broadcast replica
            self.content_gate = None
            self.probe_tier = [
                _cls(ContentProbeShard, 0.25).remote(
                    i, config.content_probe_shards,
                    config.phash_max_hamming)
                for i in range(config.content_probe_shards)
            ]
        else:
            self.content_gate = _cls(ContentGate, 0.5).remote(
                config.content_max_similarity, config.phash_max_hamming
            )
            self.probe_tier = None
        self.robots = _cls(RobotsCache, 0.25).remote(store.robots)
        self.wave = 0
        self.next_seq = 0
        self.pages_fetched = 0
        from searchengine_ray.state.frontier import (
            InMemoryFrontierPool, PartitionedFrontierPool)

        if config.frontier_spill_dir:
            self.pool = PartitionedFrontierPool(
                config.frontier_spill_dir, config.frontier_partitions)
        else:
            self.pool = InMemoryFrontierPool()
        self.crawl_order_frames: list[pd.DataFrame] = []
        self.metrics: list[dict] = []
        # wave pipelining: outstanding speculative fetch results
        # [(table ref, seqs it covers)] + the covered-seq set
        self._spec: list[tuple] = []
        self._spec_seqs: set[int] = set()
        self._spec_predicted: pd.DataFrame | None = None
        self._init_store_fp()
        if _restore is None:
            self._seed()
        else:
            self._restore(_restore)

    # ------------------------------------------------------------------ init
    def _seed(self) -> None:
        rows = []
        for u in self.config.seed_urls:
            nu = normalize(urldefrag_str(u))
            from searchengine_ray.utils.urls import get_urlhash

            h = get_urlhash(nu)
            host = nu.split("/")[2] if "//" in nu else ""
            shard = _host_shard(host, self.config.num_gate_shards)
            (newly,) = ray.get(self.gates[shard].seed.remote([(host, nu, h)]))
            if newly:
                pr = (self.config.priority_fn(nu, host, 0)
                      if self.config.priority_fn else 0.0)
                rows.append((self.next_seq, nu, host, 0, pr))
                self.next_seq += 1
        self.pool.add(pd.DataFrame(
            rows, columns=["seq", "url_norm", "host", "wave", "priority"]
        ).astype({"seq": np.int64, "wave": np.int32, "priority": np.float64}))

    # ------------------------------------------- content-store bookkeeping --
    _STORE_FP_SCHEMA = pa.schema([
        ("seq", pa.int64()), ("shingles", pa.list_(pa.int64())),
        ("phash", pa.int64()),
    ])

    def _init_store_fp(self, tbl: pa.Table | None = None) -> None:
        # store broadcast = ordered chain of per-wave DELTA tables; workers
        # ingest only deltas they haven't applied (incremental StoreIndex) —
        # the broadcast cost per wave is the wave's accepted fingerprints,
        # not the cumulative store
        self._store_delta_refs: list = []
        if tbl is not None and tbl.num_rows:
            self._store_delta_refs.append(ray.put(tbl))
        self._pending_admit = None
        self._last_delta_tbl = None  # this wave's accepted fps (checkpoint unit)
        self._last_delta_ds = None  # giant-wave form: delta as dataset blocks

    def _append_store_fp(self, live_tbl: pa.Table, gate_out: list[str],
                         admit_actor: bool) -> None:
        """Append this wave's accepted fingerprints as a new store delta.
        Replica mode: extend the broadcast delta chain (and, for the
        parallel path, sync the gate actor whose copy backs the inline
        path).  Tier mode: route the delta's rows to their probe shards."""
        if not gate_out:
            return
        mask = pa.array([d == "accept" for d in gate_out], pa.bool_())
        accepted = live_tbl.filter(mask)
        if accepted.num_rows == 0:
            return
        self._last_delta_tbl = accepted
        self._last_delta_ds = None
        if self.probe_tier is not None:
            self._pending_admit = self._route_to_tier(accepted)
            return
        self._store_delta_refs.append(ray.put(accepted))
        if admit_actor:
            self._pending_admit = [self.content_gate.bulk_admit.remote(accepted)]

    def _route_to_tier(self, tbl: pa.Table) -> list:
        """Slice an accepted-fingerprint table by ``seq % N`` and ship each
        slice to its probe shard; returns the in-flight admit futures."""
        n = len(self.probe_tier)
        shards = np.asarray(tbl["seq"].to_numpy(zero_copy_only=False)) % n
        futs = []
        for s in range(n):
            m = shards == s
            if m.any():
                futs.append(self.probe_tier[s].add_table.remote(
                    tbl.filter(pa.array(m))))
        return futs

    def _flush_admits(self) -> None:
        if getattr(self, "_pending_admit", None):
            ray.get(self._pending_admit)
        self._pending_admit = None

    # ------------------------------------------------- inline (small-wave) --
    def _fetch_validate_inline(self, wave_df: pd.DataFrame) -> pa.Table:
        """Driver-side fetch+validate for small waves — same kernels as the
        distributed path (Fetcher.__call__ + _validate_batch); speculative
        results for these seqs are consumed instead of refetched."""
        import pyarrow.compute as pc

        refs, covered = self._spec_hits(wave_df)
        parts = []
        if refs:
            arr = pa.array(sorted(covered), pa.int64())
            for t in ray.get(refs):
                ft = t.filter(pc.is_in(t["seq"], value_set=arr))
                if ft.num_rows:
                    parts.append(ft)
        rest = wave_df[~wave_df["seq"].isin(covered)] if covered else wave_df
        if len(rest) or not parts:
            if not hasattr(self, "_inline_fetcher"):
                self._inline_fetcher = Fetcher(self.store_ref,
                                               self.config.politeness_delay)
            batch = pa.Table.from_pandas(rest, preserve_index=False)
            fetched = self._inline_fetcher(batch)
            parts.append(_validate_batch(fetched, self.config.ngram_size))
        return pa.concat_tables(parts) if len(parts) > 1 else parts[0]

    def _host_gate_inline(self, links: pd.DataFrame) -> pd.DataFrame:
        """Driver-side host-gate dispatch: one RPC per host, issued in
        parallel across shards, each host's UNIQUE candidates in discovery
        order (see _dedup_candidates)."""
        frames = []
        futures = []
        for _host, g in _dedup_candidates(links).groupby("host", sort=False):
            g = g.sort_values(["parent_rank", "link_idx"], kind="stable")
            shard = _host_shard(_host, self.config.num_gate_shards)
            rows = list(zip(g["host"], g["url_norm"], g["url_hash"]))
            futures.append(self.gates[shard].process.remote(rows))
            frames.append(g)
        out_frames = []
        for g, out in zip(frames, ray.get(futures)):
            g = g.copy()
            g["decision"] = out
            out_frames.append(g)
        return (pd.concat(out_frames, ignore_index=True)
                if out_frames else _empty_gate_frame())

    # ------------------------------------------------------------------ waves
    def _wave_slice(self) -> pd.DataFrame:
        """Priority-queue slice: (priority DESC, discovery seq) per host —
        pure FIFO when no priority_fn is set (all priorities 0.0).  The
        returned frame's ROW ORDER is the wave's processing order.  The
        slice semantics live in the pool (state/frontier.py) — identical for
        the in-memory and the partitioned spill pool."""
        cap = (max(0, self.config.max_pages - self.pages_fetched)
               if self.config.max_pages is not None else None)
        if self._spec_on():
            take, peek = self.pool.slice_wave(
                self.config.per_host_wave_budget, cap, peek_next=True)
            self._spec_predicted = peek
            return take
        return self.pool.slice_wave(self.config.per_host_wave_budget, cap)

    # --------------------------------------------------- wave pipelining --
    def _spec_on(self) -> bool:
        # pacing clocks are per-actor; speculative fetches would bypass them
        return (self.config.speculative_fetch
                and self.config.politeness_delay == 0)

    def _launch_speculation(self) -> None:
        """Fire speculative fetch+validate tasks for the predicted next
        slice (frontier backlog) — they run while THIS wave's gate/link/
        frontier stages occupy the driver."""
        pred = self._spec_predicted
        self._spec_predicted = None
        if pred is None or not len(pred):
            return
        new = pred[~pred["seq"].isin(self._spec_seqs)]
        if not len(new):
            return
        bs = self.config.fetch_batch_size
        cols = ["seq", "url_norm", "host", "wave"]
        for i in range(0, len(new), bs):
            chunk = new.iloc[i:i + bs]
            tbl = pa.Table.from_pandas(chunk[cols], preserve_index=False)
            ref = _spec_fetch_validate.remote(
                self.store_ref, tbl, self.config.ngram_size)
            seqs = chunk["seq"].to_numpy(dtype=np.int64)
            self._spec.append((ref, seqs))
            self._spec_seqs.update(int(s) for s in seqs)

    def _spec_hits(self, wave_df: pd.DataFrame):
        """(refs covering this wave, covered seq set) — refs stay alive for
        their unconsumed rows; consumed seqs are pruned at wave end."""
        if not self._spec:
            return [], set()
        wave_seqs = {int(s) for s in wave_df["seq"]}
        use, covered = [], set()
        for ref, seqs in self._spec:
            hit = [int(x) for x in seqs if int(x) in wave_seqs]
            if hit:
                use.append(ref)
                covered.update(hit)
        return use, covered

    def _spec_prune(self, wave_df: pd.DataFrame) -> None:
        if not self._spec:
            return
        consumed = np.fromiter((int(s) for s in wave_df["seq"]), dtype=np.int64,
                               count=len(wave_df))
        kept = []
        for ref, seqs in self._spec:
            rest = seqs[~np.isin(seqs, consumed)]
            if rest.size:
                kept.append((ref, rest))
        self._spec = kept
        self._spec_seqs.difference_update(int(s) for s in consumed)

    def run_wave(self) -> bool:
        """Run one wave; returns False when the crawl is finished."""
        if len(self.pool) == 0:
            return False
        if self.config.max_waves is not None and self.wave >= self.config.max_waves:
            return False
        wave_df = self._wave_slice()
        if len(wave_df) == 0:
            return False
        t0 = time.monotonic()
        cfg = self.config
        self._last_delta_tbl = None  # reset the per-wave checkpoint delta
        self._last_delta_ds = None
        # processing rank of each page in this wave (row order of the slice);
        # all order-dependent gates run in THIS order — identical to seq
        # order under FIFO, priority order under a priority_fn
        rank_map = {int(s): i for i, s in enumerate(wave_df["seq"])}

        # wave pipelining: fire the predicted-next-wave speculative fetches
        # FIRST — they overlap this wave's whole pipeline
        if self._spec_on():
            self._launch_speculation()

        # Small waves (BFS head/tail) skip Ray Data task scheduling and run
        # the SAME kernels inline on the driver — identical semantics (the
        # conformance suite runs both paths), ~10× lower per-wave overhead.
        # Wide waves take the distributed path, which is what scales.
        inline = len(wave_df) <= cfg.inline_wave_threshold
        if inline:
            validated_tbl = self._fetch_validate_inline(wave_df)
            validated = None
        else:
            from searchengine_ray.stages.content_probe import (
                get_store_index, probe_batch, probe_tier_batch)

            self._flush_admits()
            max_sim, max_ham = cfg.content_max_similarity, cfg.phash_max_hamming
            tier = self.probe_tier
            export_refs = tuple(self._store_delta_refs) if tier is None else ()

            def probe_fn(b: pa.Table) -> pa.Table:
                cols = (b["shingles"].to_pylist(), b["phash"].to_pylist(),
                        b["status"].to_pylist())
                if tier is not None:
                    text, image = probe_tier_batch(*cols, tier, max_sim)
                else:
                    idx = get_store_index(export_refs, max_ham)
                    text, image = probe_batch(*cols, idx, max_sim)
                return (b.append_column("store_text_dup", pa.array(text))
                        .append_column("store_image_dup", pa.array(image)))

            ngram_size = cfg.ngram_size
            store_ref = self.store_ref
            spec_refs, covered = self._spec_hits(wave_df)
            fetch_df = (wave_df[~wave_df["seq"].isin(covered)]
                        if covered else wave_df)
            parts = []
            if len(fetch_df):
                # from_pandas yields ONE block and map parallelism is
                # per-block — split the wave so every core gets tasks
                # (blocks ≈ batch-sized, capped at 4×cluster CPUs).
                # NOTE: driver-side pre-splitting via rd.from_blocks was
                # tried (kills this repartition exchange, ~15-20% on the
                # many-wave shape) and REVERTED: it flaky-deadlocks the
                # streaming executor inside this materialize on small
                # (4-CPU) sessions — hung 3 of 6 suite runs at
                # test_engine_matches_oracle_distributed_append, always
                # in get_output_blocking, while this construction has
                # survived every suite since round 1.
                ncpu = int(ray.cluster_resources().get("CPU", 8))
                # ≥8 rows per block, capped at 4×CPUs: small waves still
                # fan out (links explode ~fanout× rows), big waves get
                # full blocks
                nblocks = max(1, min(len(fetch_df) // 8 + 1, 4 * ncpu))
                wave_ds = rd.from_pandas(fetch_df).repartition(nblocks)
                if cfg.politeness_delay > 0:
                    # pacing needs per-actor clocks → actor pool
                    fetched = wave_ds.map_batches(
                        Fetcher,
                        fn_constructor_kwargs={"store_ref": store_ref,
                                               "delay": cfg.politeness_delay},
                        batch_format="pyarrow", batch_size=cfg.fetch_batch_size,
                        concurrency=(1, cfg.fetch_concurrency), num_cpus=0.25,
                    )
                    parts.append(fetched.map_batches(
                        lambda b: _validate_batch(b, ngram_size),
                        batch_format="pyarrow"))
                else:
                    # stateless fetch+validate tasks — no per-wave actor
                    # pool spin-up; broadcasts memoized per worker
                    def fetch_validate(b: pa.Table) -> pa.Table:
                        f = Fetcher(_get_broadcast(store_ref), 0.0)
                        return _validate_batch(f(b), ngram_size)

                    parts.append(wave_ds.map_batches(
                        fetch_validate, batch_format="pyarrow",
                        batch_size=cfg.fetch_batch_size))
            if spec_refs:
                # already-fetched speculative rows: keep this wave's seqs
                cov_ref = ray.put(pa.array(sorted(covered), pa.int64()))

                def keep_wave(b: pa.Table) -> pa.Table:
                    import pyarrow.compute as pc

                    return b.filter(pc.is_in(b["seq"],
                                             value_set=ray.get(cov_ref)))

                parts.append(rd.from_arrow_refs(spec_refs).map_batches(
                    keep_wave, batch_format="pyarrow"))
            prevalidated = parts[0]
            for p in parts[1:]:
                prevalidated = prevalidated.union(p)
            validated = prevalidated.map_batches(
                probe_fn, batch_format="pyarrow").materialize()
            validated_tbl = None

        t_fetch = time.monotonic() - t0

        # ---- content gate: compact fingerprints only, in seq order --------
        # Arrow end to end: pandas conversion of the list<int64> shingle
        # column costs ~10× the gate loop itself at 10^5-row waves.
        import pyarrow.compute as pc

        fp_cols = ["seq", "status", "integrity_ok", "shingles", "phash"]
        decision = None
        if inline:
            # tiny wave → gate state must be current: flush any in-flight
            # admits first
            self._flush_admits()
            fp_tbl = validated_tbl.select(fp_cols)
            fp_tbl = fp_tbl.take(pc.sort_indices(pa.array(
                [rank_map[int(s)] for s in fp_tbl["seq"].to_pylist()], pa.int64())))
            live_tbl = fp_tbl.filter(
                pc.and_(pc.equal(fp_tbl["status"], 200), fp_tbl["integrity_ok"])
            ).select(["seq", "shingles", "phash"])
            if self.probe_tier is not None:
                # tier mode has no monolithic gate actor: probe the shards
                # from the driver, then the exact sequential resolve
                from searchengine_ray.stages.content_probe import (
                    probe_tier_batch, resolve_wave)

                text, image = probe_tier_batch(
                    live_tbl["shingles"].to_pylist(),
                    live_tbl["phash"].to_pylist(),
                    [200] * live_tbl.num_rows,
                    self.probe_tier, cfg.content_max_similarity,
                )
                gate_out = resolve_wave(
                    live_tbl, text, image,
                    cfg.content_max_similarity, cfg.phash_max_hamming,
                )
                self._append_store_fp(live_tbl, gate_out, admit_actor=True)
            else:
                gate_out = ray.get(self.content_gate.process_table.remote(live_tbl))
                self._append_store_fp(live_tbl, gate_out, admit_actor=False)
        elif len(wave_df) <= cfg.driver_fp_threshold:
            from searchengine_ray.stages.content_probe import resolve_wave

            fp_tbl = pa.concat_tables(
                ray.get(validated.select_columns(
                    fp_cols + ["store_text_dup", "store_image_dup"]
                ).to_arrow_refs())
            )
            fp_tbl = fp_tbl.take(pc.sort_indices(pa.array(
                [rank_map[int(s)] for s in fp_tbl["seq"].to_pylist()], pa.int64())))
            live_full = fp_tbl.filter(
                pc.and_(pc.equal(fp_tbl["status"], 200), fp_tbl["integrity_ok"])
            )
            live_tbl = live_full.select(["seq", "shingles", "phash"])
            gate_out = resolve_wave(
                live_tbl,
                np.asarray(live_full["store_text_dup"].to_numpy(zero_copy_only=False)),
                np.asarray(live_full["store_image_dup"].to_numpy(zero_copy_only=False)),
                cfg.content_max_similarity, cfg.phash_max_hamming,
            )
            self._append_store_fp(live_tbl, gate_out, admit_actor=True)
        else:
            # GIANT wave: the fingerprints (shingle lists) never concat on
            # the driver — distributed interaction graph, interacting-only
            # pull, sequential replay of (typically ~0) walk pages
            decision, fp_seqs, fp_status = self._resolve_wave_distributed(
                validated, rank_map)
        if decision is None:
            decision = dict(zip(live_tbl["seq"].to_pylist(), gate_out))
            fp_seqs = fp_tbl["seq"].to_pylist()
            fp_status = fp_tbl["status"].to_pylist()
        for s in fp_seqs:
            if s not in decision:
                decision[s] = "error"

        self.pages_fetched += len(fp_seqs)

        # ---- crawl order record ------------------------------------------
        order_df = wave_df[["seq", "url_norm"]].copy()
        order_df["wave"] = np.int32(self.wave)  # fetch wave (≠ discovery wave in budget mode)
        order_df["rank"] = np.arange(len(order_df), dtype=np.int64)  # processing order
        order_df["status"] = order_df["seq"].map(dict(zip(fp_seqs, fp_status)))
        order_df["decision"] = order_df["seq"].map(decision)
        # with a checkpoint + hold_order_in_memory=False the per-wave order
        # lands ONLY on disk — the driver's heap stays flat across waves
        if cfg.hold_order_in_memory or not cfg.checkpoint_dir:
            self.crawl_order_frames.append(order_df)

        t_gate = time.monotonic() - t0 - t_fetch

        # ---- pages sink (accepted payload rows) ---------------------------
        accepted_seqs = {s for s, d in decision.items() if d == "accept"}
        page_cols = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash",
                     "url_norm", "wave", "seq"]
        pages_dir = None
        accepted_arr = pa.array(sorted(accepted_seqs), type=pa.int64())
        if inline:
            import pyarrow.compute as pc

            mask = pc.is_in(validated_tbl["seq"], value_set=accepted_arr)
            accepted_tbl = validated_tbl.filter(mask)
            if cfg.checkpoint_dir:
                pages_dir = os.path.join(cfg.checkpoint_dir, "pages",
                                         f"wave={self.wave}")
                tmp = pages_dir + ".tmp"
                if os.path.exists(tmp):
                    shutil.rmtree(tmp)
                os.makedirs(tmp, exist_ok=True)
                import pyarrow.parquet as pq

                pq.write_table(accepted_tbl.select(page_cols),
                               os.path.join(tmp, "part-0.parquet"))
                if os.path.exists(pages_dir):
                    shutil.rmtree(pages_dir)
                os.replace(tmp, pages_dir)
        else:
            seq_ref = ray.put(accepted_arr)

            def keep_accepted(b: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                m = pc.is_in(b["seq"], value_set=ray.get(seq_ref))
                return b.filter(m)

            if cfg.checkpoint_dir:
                pages_dir = os.path.join(cfg.checkpoint_dir, "pages",
                                         f"wave={self.wave}")
                tmp = pages_dir + ".tmp"
                if os.path.exists(tmp):
                    shutil.rmtree(tmp)
                validated.map_batches(keep_accepted, batch_format="pyarrow"
                                      ).select_columns(page_cols).write_parquet(tmp)
                os.makedirs(tmp, exist_ok=True)  # 0-row write creates nothing
                if os.path.exists(pages_dir):
                    shutil.rmtree(pages_dir)
                os.replace(tmp, pages_dir)
            # links only need 3 small columns — prune BEFORE the filter so
            # the image payload bytes never move through the link pipeline
            accepted_ds = validated.select_columns(
                ["seq", "url_norm", "links"]
            ).map_batches(keep_accepted, batch_format="pyarrow")

        # ---- link pipeline ------------------------------------------------
        allowed = cfg.allowed_domains
        extra_filter = cfg.extra_link_filter
        if inline:
            links_tbl = _explode_links(
                accepted_tbl.select(["seq", "url_norm", "links"]), allowed,
                rank_map, extra_filter)
            if links_tbl.num_rows > 0:
                hosts = list(set(links_tbl["host"].to_pylist()))
                rules = (ray.get(self.robots.disallowed_prefixes.remote(hosts))
                         if cfg.use_robots else {})
                links_tbl = _robots_filter_table(links_tbl, rules)
                gate_res = self._host_gate_inline(links_tbl.to_pandas())
            else:
                gate_res = _empty_gate_frame()
            n_candidates = int(gate_res["occurrences"].sum()) if len(gate_res) else 0
        else:
            robots_actor = self.robots
            use_robots = cfg.use_robots
            rank_ref = ray.put(rank_map)

            def explode_and_robots(b: pa.Table) -> pa.Table:
                out = _explode_links(b, allowed, _get_broadcast(rank_ref),
                                     extra_filter)
                if out.num_rows == 0 or not use_robots:
                    return out
                hosts = list(set(out["host"].to_pylist()))
                rules = ray.get(robots_actor.disallowed_prefixes.remote(hosts))
                return _robots_filter_table(out, rules)

            gates = self.gates
            nshards = cfg.num_gate_shards

            def host_gate(g: pd.DataFrame) -> pd.DataFrame:
                # collapse duplicate URLs (occurrence-weighted) — the gate
                # RPC carries only unique (hash, string) candidates, in
                # discovery order (see _dedup_candidates for why the string
                # is part of the key)
                g = g.sort_values(["parent_rank", "link_idx"], kind="stable")
                occ = g.groupby(_CAND_KEY, sort=False)["occurrences"].sum().reset_index()
                g = (g.drop_duplicates(_CAND_KEY, keep="first")
                     .drop(columns=["occurrences"]).merge(occ, on=_CAND_KEY)
                     .sort_values(["parent_rank", "link_idx"], kind="stable"))
                g["occurrences"] = g["occurrences"].astype(np.int64)
                host = g["host"].iloc[0]
                shard = _host_shard(host, nshards)
                rows = list(zip(g["host"], g["url_norm"], g["url_hash"]))
                out = ray.get(gates[shard].process.remote(rows))
                g["decision"] = out
                return g

            # single chained execution:
            # explode → robots → batch-local dedup → groupby → gate
            chain = (
                accepted_ds
                .map_batches(explode_and_robots, batch_format="pyarrow")
                .map_batches(_dedup_candidates, batch_format="pandas")
                .groupby("host")
                .map_groups(host_gate, batch_format="pandas")
            )
            if len(wave_df) * cfg.max_links_per_page <= cfg.driver_link_threshold:
                # wave small enough that even max-fanout candidates are
                # driver-trivial: collect once (executes the gate RPCs),
                # skip the distributed-append machinery entirely
                # (cfg.max_links_per_page bounds per-page fan-out — a
                # corpus with higher fan-out must raise the knob or the
                # gate frame can exceed driver_link_threshold)
                gate_res = chain.to_pandas()
                if gate_res.empty:
                    gate_res = _empty_gate_frame()
            else:
                # materialize: the gate RPCs mutate actor state and must
                # run EXACTLY once; the blocks stay distributed in the
                # object store, never on the driver
                gated = chain.materialize()
                gate_res = None
                n_candidates, link_dec = _gate_counts_distributed(gated)
                # few accepts → driver seq assignment is still cheaper
                # than the distributed append's extra all-to-all stages
                # (frame provably bounded by the thresholds)
                if link_dec.get("accept", 0) <= cfg.driver_link_threshold \
                        and n_candidates <= 4 * cfg.driver_link_threshold:
                    gate_res = gated.to_pandas()
                    if gate_res.empty:
                        gate_res = _empty_gate_frame()
        if gate_res is not None:
            n_candidates = int(gate_res["occurrences"].sum()) if len(gate_res) else 0
            link_dec = _link_decision_counts(gate_res)
        link_counts = {"candidates": n_candidates}

        t_links = time.monotonic() - t0 - t_fetch - t_gate

        # ---- frontier(w+1): FIFO seq assignment ---------------------------
        pf = cfg.priority_fn
        if gate_res is not None:
            accepted_links = gate_res[gate_res["decision"] == "accept"].sort_values(
                ["parent_rank", "link_idx"]
            ).reset_index(drop=True)
            prios = (
                np.array([pf(u, h, self.wave + 1) for u, h in
                          zip(accepted_links["url_norm"], accepted_links["host"])],
                         dtype=np.float64)
                if pf else np.zeros(len(accepted_links), dtype=np.float64)
            )
            new_rows = pd.DataFrame({
                "seq": self.next_seq + np.arange(len(accepted_links), dtype=np.int64),
                "url_norm": accepted_links["url_norm"],
                "host": accepted_links["host"],
                "wave": np.int32(self.wave + 1),
                "priority": prios,
            })
            n_accepted = len(accepted_links)
            self.pool.add(new_rows)
        else:
            n_accepted = self._append_frontier_distributed(gated, pf)
        self.next_seq += n_accepted

        # ---- metrics ------------------------------------------------------
        from collections import Counter

        page_dec = Counter(order_df["decision"])
        wall = time.monotonic() - t0
        n_cand = int(link_counts["candidates"])
        n_link_dups = int(link_dec.get("dup", 0) + link_dec.get("trap", 0))
        # per-partition (gate-shard) lineage: seen-set size per shard +
        # this wave's per-host fetch counts (north-star: per-partition
        # throughput/dedup-rate metrics)
        shard_seen = ray.get([g.seen_count.remote() for g in self.gates])
        per_host = order_df["url_norm"].map(
            lambda u: u.split("/")[2]).value_counts().to_dict()
        metric = {
            "driver_rss_mb": _driver_rss_mb(),
            "driver_private_mb": _driver_private_mb(),
            "wave": self.wave,
            "fetched": int(len(fp_seqs)),
            "pages_per_sec": round(len(fp_seqs) / wall, 2) if wall > 0 else None,
            "wall_sec": round(wall, 3),
            "stage_sec": {"fetch_validate": round(t_fetch, 3),
                          "content_gate": round(t_gate, 3),
                          "links_gate": round(t_links, 3)},
            "inline": inline,
            "page_decisions": dict(page_dec),
            "link_candidates": n_cand,
            "link_decisions": dict(link_dec),
            "link_dedup_rate": round(n_link_dups / n_cand, 4) if n_cand else 0.0,
            "shard_seen_counts": [int(s) for s in shard_seen],
            "fetched_per_host": {h: int(c) for h, c in per_host.items()},
            "frontier_pending": int(len(self.pool)),
            "next_seq": int(self.next_seq),
        }
        self.metrics.append(metric)

        if cfg.checkpoint_dir:
            self._checkpoint(order_df, metric)
        self._spec_prune(wave_df)
        self.wave += 1
        return True

    # ------------------------------------------ distributed content resolve --
    def _resolve_wave_distributed(self, validated, rank_map: dict[int, int]):
        """Content-gate resolve for GIANT waves: nothing fingerprint-sized
        lands on the driver (kills the ``pa.concat_tables(ray.get(...))`` of
        the wave's shingle lists — VERDICT r2 'What's wrong' #1).

        1. O(wave) SCALAR meta (seq, status, flags) to the driver — same
           order of driver memory as the wave slice / order log itself.
        2. The intra-wave partner graph runs distributed
           (``interacting_seqs_distributed``: shared-shingle / shared-band
           co-shuffles, the ``ngram_jaccard_pairs`` shape).
        3. Only interacting pages' fingerprints are pulled and replayed
           sequentially (``resolve_wave_split``).
        4. Accepted fingerprints re-enter the store as the dataset's own
           blocks (``_append_store_fp_distributed``) — never a driver table.

        Returns (decision dict, fp_seqs, fp_status)."""
        import pyarrow.compute as pc

        from searchengine_ray.stages.content_probe import (
            interacting_seqs_distributed, resolve_wave_split)

        cfg = self.config
        meta = validated.select_columns(
            ["seq", "status", "integrity_ok", "store_text_dup",
             "store_image_dup"]).to_pandas()
        live = meta[(meta["status"] == 200) & meta["integrity_ok"]]
        live_meta = pd.DataFrame({
            "seq": live["seq"].to_numpy(dtype=np.int64),
            "store_text": live["store_text_dup"].to_numpy(dtype=bool),
            "store_image": live["store_image_dup"].to_numpy(dtype=bool)})
        inter = interacting_seqs_distributed(
            validated, cfg.content_max_similarity, cfg.phash_max_hamming)
        walk_tbl = None
        if inter.size:
            inter_ref = ray.put(pa.array(inter.tolist(), pa.int64()))

            def keep_inter(b: pa.Table) -> pa.Table:
                return b.filter(pc.is_in(b["seq"], value_set=ray.get(inter_ref)))

            walk_tbl = pa.concat_tables(ray.get(
                validated.select_columns(["seq", "shingles", "phash"])
                .map_batches(keep_inter, batch_format="pyarrow")
                .to_arrow_refs()))
        decision = resolve_wave_split(
            live_meta, walk_tbl, rank_map,
            cfg.content_max_similarity, cfg.phash_max_hamming)
        accepted = np.array(
            sorted(s for s, d in decision.items() if d == "accept"), np.int64)
        self._append_store_fp_distributed(validated, accepted)
        return decision, meta["seq"].tolist(), meta["status"].tolist()

    def _append_store_fp_distributed(self, validated, accepted: np.ndarray) -> None:
        """Wave-delta ingestion without driver materialization: the accepted
        fingerprints stay as dataset blocks in the object store; the delta
        chain / probe shards / checkpoint all consume the block refs."""
        self._last_delta_tbl = None
        self._last_delta_ds = None
        if accepted.size == 0:
            return
        acc_ref = ray.put(pa.array(accepted.tolist(), pa.int64()))

        def keep(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            m = pc.and_(
                pc.and_(pc.equal(b["status"], 200), b["integrity_ok"]),
                pc.is_in(b["seq"], value_set=ray.get(acc_ref)))
            return b.filter(m).select(["seq", "shingles", "phash"])

        acc_ds = validated.select_columns(
            ["seq", "shingles", "phash", "status", "integrity_ok"]
        ).map_batches(keep, batch_format="pyarrow").materialize()
        refs = acc_ds.to_arrow_refs()
        self._last_delta_ds = acc_ds  # _checkpoint writes the delta from this
        if self.probe_tier is not None:
            self._pending_admit = [
                s.add_table_sliced.remote(r)
                for r in refs for s in self.probe_tier]
        else:
            self._store_delta_refs.extend(refs)
            self._pending_admit = [
                self.content_gate.bulk_admit.remote(r) for r in refs]

    # ----------------------------------------- distributed frontier append --
    def _append_frontier_distributed(self, gated, pf) -> int:
        """Accepted candidates → frontier(w+1) WITHOUT landing on the
        driver: the distributed FIFO rank the module docstring promises.

        seq(link) = next_seq + |accepted links with smaller parent_rank|
                  + rank of link_idx within its parent — value-based (no
        reliance on block ordering): per-parent accepted counts come back
        tiny (≤ wave pages, already driver-resident as the wave slice), the
        exclusive prefix sum over parent_rank broadcasts, and within-parent
        ranks are one vectorized cumcount per hash bucket.  The resulting
        rows stream into the pool batch-by-batch."""
        from searchengine_ray.stages.relational import bucketed_apply, pre_aggregate

        acc = gated.map_batches(
            lambda df: df[(df["decision"] == "accept").to_numpy()]
            [["parent_rank", "link_idx", "url_norm", "host"]],
            batch_format="pandas")
        per_parent = pre_aggregate(acc, ["parent_rank"],
                                   {"n": (None, "count")}).to_pandas()
        n_accepted = int(per_parent["n"].sum()) if len(per_parent) else 0
        if n_accepted == 0:
            return 0
        per_parent = per_parent.sort_values("parent_rank")
        offsets = np.zeros(len(per_parent), dtype=np.int64)
        np.cumsum(per_parent["n"].to_numpy()[:-1], out=offsets[1:])
        off_ref = ray.put(dict(zip(per_parent["parent_rank"].astype(int), offsets)))
        base = self.next_seq
        next_wave = np.int32(self.wave + 1)

        def rank_within(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["parent_rank", "link_idx"], kind="mergesort")
            g["_r"] = g.groupby("parent_rank", sort=False).cumcount()
            return g

        ranked = bucketed_apply(acc, ["parent_rank"], rank_within)

        def to_pool_rows(df: pd.DataFrame) -> pd.DataFrame:
            off = _get_broadcast(off_ref)
            parent_off = df["parent_rank"].map(off).to_numpy(dtype=np.int64)
            urls = df["url_norm"]
            hosts = df["host"]
            prios = (np.fromiter((pf(u, h, int(next_wave)) for u, h in
                                  zip(urls, hosts)),
                                 dtype=np.float64, count=len(df))
                     if pf else np.zeros(len(df), dtype=np.float64))
            return pd.DataFrame({
                "seq": base + parent_off + df["_r"].to_numpy(dtype=np.int64),
                "url_norm": urls.to_numpy(),
                "host": hosts.to_numpy(),
                "wave": np.full(len(df), next_wave, dtype=np.int32),
                "priority": prios,
            })

        # priority_fn now runs INSIDE tasks: functions from modules the
        # workers can't import (e.g. a test module) must ship by value
        mod = None
        if pf is not None:
            import sys as _sys

            from ray import cloudpickle as _cp

            mod = _sys.modules.get(getattr(pf, "__module__", ""))
            if mod is not None and mod.__name__ not in ("__main__", "builtins"):
                try:
                    _cp.register_pickle_by_value(mod)
                except Exception:
                    mod = None
        try:
            self.pool.add_dataset(
                ranked.map_batches(to_pool_rows, batch_format="pandas"))
        finally:
            if mod is not None:
                try:
                    from ray import cloudpickle as _cp

                    _cp.unregister_pickle_by_value(mod)
                except Exception:
                    pass
        return n_accepted

    # ------------------------------------------------------------ checkpoint
    def _checkpoint(self, order_df: pd.DataFrame, metric: dict) -> None:
        """Per-wave INCREMENTAL checkpoint: every artifact is O(wave), not
        O(crawl) — host-gate admit deltas + this wave's accepted content
        fingerprints; restore replays deltas in wave order (bit-identical,
        verified by tests)."""
        self._flush_admits()  # gate actor must be current before dump
        d = self.config.checkpoint_dir
        storage.write_table_atomic(
            pa.Table.from_pandas(order_df, preserve_index=False),
            os.path.join(d, "crawl_order", f"wave={self.wave}"),
        )
        self.pool.snapshot_to(os.path.join(d, "frontier", f"wave={self.wave + 1}"))
        host_deltas = ray.get([g.dump_delta.remote() for g in self.gates])
        storage.write_json_atomic(
            {"shards": host_deltas},
            os.path.join(d, "state", f"wave={self.wave}", "hostgate_deltas.json"),
        )
        if self._last_delta_tbl is not None and self._last_delta_tbl.num_rows:
            storage.write_table_atomic(
                self._last_delta_tbl,
                os.path.join(d, "state", f"wave={self.wave}", "content_delta"),
            )
        elif self._last_delta_ds is not None:
            # giant-wave delta: distributed parquet write of the dataset
            # blocks (tmp + rename for atomicity) — never a driver table
            dest = os.path.join(d, "state", f"wave={self.wave}",
                                "content_delta_dir")
            tmp = dest + ".tmp"
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            self._last_delta_ds.write_parquet(tmp)
            os.makedirs(tmp, exist_ok=True)  # 0-row write creates nothing
            if os.path.exists(dest):
                shutil.rmtree(dest)
            os.replace(tmp, dest)
        storage.write_json_atomic(metric, os.path.join(d, "metrics", f"wave={self.wave}.json"))
        storage.write_json_atomic(
            {"format": _CHECKPOINT_FORMAT,
             "completed_wave": self.wave, "next_seq": self.next_seq,
             "pages_fetched": self.pages_fetched,
             "config_hash": self.config.config_hash(),
             "num_gate_shards": self.config.num_gate_shards},
            os.path.join(d, "manifest.json"),
        )

    def _restore(self, manifest: dict) -> None:
        d = self.config.checkpoint_dir
        w = manifest["completed_wave"]
        fmt = manifest.get("format", 1)
        if fmt != _CHECKPOINT_FORMAT:
            raise ValueError(
                f"incompatible checkpoint format {fmt} (engine writes "
                f"{_CHECKPOINT_FORMAT}): format-1 checkpoints carried full "
                "gate dumps instead of per-wave deltas and cannot be "
                "replayed — re-run the crawl to produce a new checkpoint"
            )
        if manifest["config_hash"] != self.config.config_hash():
            raise ValueError("checkpoint was written under different crawl semantics")
        if manifest.get("num_gate_shards", self.config.num_gate_shards) != \
                self.config.num_gate_shards:
            raise ValueError(
                "checkpoint has a different gate-shard count — seen-set "
                "dumps cannot be redistributed (host→hash mapping is not "
                "in the dump format); resume with num_gate_shards="
                f"{manifest['num_gate_shards']}"
            )
        self.wave = w + 1
        self.next_seq = manifest["next_seq"]
        self.pages_fetched = manifest["pages_fetched"]
        from searchengine_ray.state.frontier import load_snapshot_into

        load_snapshot_into(self.pool, os.path.join(d, "frontier", f"wave={w + 1}"))
        # replay the incremental per-wave deltas IN ORDER: host-gate admits
        # rebuild seen/cuckoo/trap state exactly; content deltas bulk_admit
        # into the gate actor and re-form the broadcast delta chain
        self._store_delta_refs = []
        self._pending_admit = None
        self._last_delta_tbl = None
        admit_futs = []
        for wv in range(w + 1):
            sd = os.path.join(d, "state", f"wave={wv}")
            host_state = storage.read_json(
                os.path.join(sd, "hostgate_deltas.json"))
            ray.get([
                g.restore_replay.remote(s["rows"], s.get("decisions"))
                for g, s in zip(self.gates, host_state["shards"])
            ])
            delta_tbls = []
            if storage.exists(os.path.join(sd, "content_delta")):
                delta_tbls.append(storage.read_table(
                    os.path.join(sd, "content_delta")))
            elif os.path.isdir(os.path.join(sd, "content_delta_dir")):
                # giant-wave delta dir: replay per FILE so the driver holds
                # one block transiently, never the wave
                import pyarrow.parquet as pq

                ddir = os.path.join(sd, "content_delta_dir")
                delta_tbls = [pq.read_table(os.path.join(ddir, f))
                              for f in sorted(os.listdir(ddir))
                              if f.endswith(".parquet")]
            for tbl in delta_tbls:
                if not tbl.num_rows:
                    continue
                if self.probe_tier is not None:
                    admit_futs.extend(self._route_to_tier(tbl))
                else:
                    self._store_delta_refs.append(ray.put(tbl))
                    admit_futs.append(self.content_gate.bulk_admit.remote(tbl))
        if admit_futs:
            ray.get(admit_futs)
        if self.config.hold_order_in_memory:
            for wv in range(w + 1):
                t = storage.read_table(os.path.join(d, "crawl_order", f"wave={wv}"))
                self.crawl_order_frames.append(t.to_pandas())

    @classmethod
    def resume(cls, store: SyntheticStore, config: CrawlConfig) -> "CrawlEngine":
        manifest = storage.read_json(os.path.join(config.checkpoint_dir, "manifest.json"))
        return cls(store, config, _restore=manifest)

    # ----------------------------------------------------------------- drive
    def run(self) -> CrawlResult:
        while self.run_wave():
            pass
        return self.result()

    def result(self) -> CrawlResult:
        """Build the result HANDLE — O(shards) driver work: each gate shard
        spills its own seen-hash table (actor-side write, count-only RPC
        reply) and the order log is passed as held frames or the per-wave
        checkpoint directory.  Nothing O(crawl) lands on the driver here;
        the eager views on CrawlResult are lazy and explicit."""
        import tempfile

        if self.config.checkpoint_dir:
            seen_dir = os.path.join(self.config.checkpoint_dir, "url_seen")
        else:
            seen_dir = tempfile.mkdtemp(prefix="crawl_url_seen_")
        counts = ray.get([
            g.dump_seen_to.remote(os.path.join(seen_dir, f"shard={i}"))
            for i, g in enumerate(self.gates)
        ])
        hold = bool(self.crawl_order_frames) or not self.config.checkpoint_dir
        return CrawlResult(
            order_frames=self.crawl_order_frames if hold else None,
            order_dir=os.path.join(self.config.checkpoint_dir, "crawl_order")
            if self.config.checkpoint_dir else None,
            num_waves=self.wave,
            seen_dir=seen_dir,
            shard_seen_counts=counts,
            metrics=self.metrics,
            pages_dir=os.path.join(self.config.checkpoint_dir, "pages")
            if self.config.checkpoint_dir else None,
        )

    def shutdown(self, timeout_s: float = 15.0) -> None:
        """Terminate the engine's actors and WAIT for their resources to
        release.  Fire-and-forget ``ray.kill`` is a cross-engine deadlock:
        the KillActor RPC can race worker reassignment and be dropped
        ("Mismatched ActorID: ignoring KillActor"), leaving an actor
        holding its CPU reservation — the NEXT engine on a small session
        then can't schedule (gates are 0.5 CPU each; two engines' worth
        exceeds the 4-CPU test fixture, measured as an infinite
        ``ray.get`` hang in the suite).  Graceful ``__ray_terminate__``
        drains and releases deterministically; anything still alive at
        ``timeout_s`` gets a force-kill.  Finally WAIT (bounded) until the
        raylet's available-CPU actually rises by the engine's reservation:
        actor death and resource release are separate events, and a stale
        raylet accounting (worker IDLE, reservation never returned —
        observed live) otherwise strands the next engine/Dataset tasks.
        A leak that persists past the wait is warned loudly instead of
        surfacing later as an unexplained scheduling hang."""
        if getattr(self, "_shutdown_done", False):
            return
        self._shutdown_done = True
        avail0 = ray.available_resources().get("CPU", 0.0)
        actors = list(self.gates)
        if self.content_gate is not None:
            actors.append(self.content_gate)
        if self.probe_tier is not None:
            actors.extend(self.probe_tier)
        actors.append(self.robots)
        refs, by_ref = [], {}
        for a in actors:
            try:
                r = a.__ray_terminate__.remote()
                refs.append(r)
                by_ref[r] = a
            except Exception:
                ray.kill(a)
        if refs:
            _, pending = ray.wait(refs, num_returns=len(refs),
                                  timeout=timeout_s)
            for r in pending:
                ray.kill(by_ref[r])
        want = avail0 + self._actor_cpu_reserved - 0.01
        if self._actor_cpu_reserved > 0:
            deadline = time.monotonic() + 10.0
            while time.monotonic() < deadline:
                if ray.available_resources().get("CPU", 0.0) >= want:
                    return
                time.sleep(0.1)
            import warnings

            warnings.warn(
                f"CrawlEngine.shutdown: {self._actor_cpu_reserved} CPU of "
                f"state-actor reservation not released after 10s "
                f"(available {ray.available_resources().get('CPU', 0.0)}, "
                f"expected ≥{want:.2f}) — the raylet leaked it; subsequent "
                f"1-CPU Ray Data tasks may be unschedulable on small "
                f"sessions", RuntimeWarning)
