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
- the frontier pool is checkpointed as one partition per wave; the driver
  holds only (seq, url_norm, host) control rows.  At full scale the pool
  becomes host-hash-partitioned parquet/Lance fragments and the FIFO seq
  assignment becomes the standard distributed rank: sort by
  (parent_seq, link_idx) → per-partition counts → exclusive prefix sum →
  per-partition offset add.  The per-wave dataflow is unchanged.
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
from dataclasses import dataclass, field
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
from searchengine_ray.sources.fixtures import SyntheticStore
from searchengine_ray.state.gates import ContentGate, HostGateShard, RobotsCache
from searchengine_ray.utils.urls import is_valid, join_url, normalize, urldefrag_str

_EMPTY = b""


def _host_shard(host: str, num_shards: int) -> int:
    return zlib.crc32(host.encode("utf-8")) % num_shards


class Fetcher:
    """Fetch stage actor: synthetic page-store lookup standing in for the
    HTTP client (reference utils/download.py:7-21).  Holds the broadcast
    store (read once per actor) and a per-host politeness clock — the
    token-bucket analog of the reference's per-thread sleep
    (README.md:202-203)."""

    def __init__(self, store_ref, delay: float):
        self.pages: dict[str, dict] = ray.get(store_ref)
        self.delay = delay
        self.last_fetch: dict[str, float] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        seqs = batch["seq"].to_pylist()
        urls = batch["url_norm"].to_pylist()
        hosts = batch["host"].to_pylist()
        waves = batch["wave"].to_pylist()
        out = {"seq": [], "url_norm": [], "host": [], "wave": [], "status": [],
               "caption": [], "bytes": [], "w": [], "h": [], "fmt": [],
               "phash": [], "links": []}
        for seq, url, host, wave in zip(seqs, urls, hosts, waves):
            if self.delay > 0:
                now = time.monotonic()
                wait = self.last_fetch.get(host, -1e18) + self.delay - now
                if wait > 0:
                    time.sleep(wait)
                self.last_fetch[host] = time.monotonic()
            page = self.pages.get(url)
            out["seq"].append(seq)
            out["url_norm"].append(url)
            out["host"].append(host)
            out["wave"].append(wave)
            if page is None or page["status"] != 200:
                out["status"].append(page["status"] if page else 404)
                out["caption"].append("")
                out["bytes"].append(_EMPTY)
                out["w"].append(0)
                out["h"].append(0)
                out["fmt"].append("")
                out["phash"].append(0)
                out["links"].append([])
            else:
                out["status"].append(200)
                out["caption"].append(page["caption"])
                out["bytes"].append(page["bytes"])
                out["w"].append(page["w"])
                out["h"].append(page["h"])
                out["fmt"].append(page["fmt"])
                out["phash"].append(page["phash"])
                out["links"].append(list(page["links"]))
        return pa.table({
            "seq": pa.array(out["seq"], pa.int64()),
            "url_norm": pa.array(out["url_norm"], pa.string()),
            "host": pa.array(out["host"], pa.string()),
            "wave": pa.array(out["wave"], pa.int32()),
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


def _explode_links(batch: pa.Table, allowed_domains) -> pa.Table:
    """Accepted page → candidate link rows with discovery-order keys
    (reference M10/M9/M6-M8 in one pass)."""
    from searchengine_ray.utils.urls import get_urlhash

    parents = batch["seq"].to_pylist()
    urls = batch["url_norm"].to_pylist()
    links = batch["links"].to_pylist()
    o_parent, o_idx, o_url, o_hash, o_host = [], [], [], [], []
    for parent_seq, page_url, lst in zip(parents, urls, links):
        for idx, raw in enumerate(lst or []):
            resolved = normalize(urldefrag_str(join_url(page_url, raw)))
            if not is_valid(resolved, allowed_domains):
                continue
            o_parent.append(parent_seq)
            o_idx.append(idx)
            o_url.append(resolved)
            o_hash.append(get_urlhash(resolved))
            o_host.append(resolved.split("/")[2])
    return pa.table({
        "parent_seq": pa.array(o_parent, pa.int64()),
        "link_idx": pa.array(o_idx, pa.int32()),
        "url_norm": pa.array(o_url, pa.string()),
        "url_hash": pa.array(o_hash, pa.string()),
        "host": pa.array(o_host, pa.string()),
    })


@dataclass
class CrawlResult:
    crawl_order: pd.DataFrame = None
    url_seen: set[str] = field(default_factory=set)
    accepted_pages: list[str] = field(default_factory=list)
    metrics: list[dict] = field(default_factory=list)
    pages_dir: str | None = None


class CrawlEngine:
    """Wave-loop driver.  Owns the gate actors and the frontier pool."""

    def __init__(self, store: SyntheticStore, config: CrawlConfig,
                 _restore: dict | None = None):
        self.config = config
        self.store = store
        self.store_ref = ray.put(store.pages)
        self.gates = [
            HostGateShard.remote(i, config.url_similarity_threshold)
            for i in range(config.num_gate_shards)
        ]
        self.content_gate = ContentGate.remote(
            config.content_max_similarity, config.phash_max_hamming
        )
        self.robots = RobotsCache.remote(store.robots)
        self.wave = 0
        self.next_seq = 0
        self.pages_fetched = 0
        self.pool = pd.DataFrame(
            {"seq": pd.Series([], dtype=np.int64),
             "url_norm": pd.Series([], dtype=str),
             "host": pd.Series([], dtype=str),
             "wave": pd.Series([], dtype=np.int32)}
        )
        self.crawl_order_frames: list[pd.DataFrame] = []
        self.metrics: list[dict] = []
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
                rows.append((self.next_seq, nu, host, 0))
                self.next_seq += 1
        self.pool = pd.DataFrame(rows, columns=["seq", "url_norm", "host", "wave"])

    # ------------------------------------------------------------------ waves
    def _wave_slice(self) -> pd.DataFrame:
        pool = self.pool.sort_values("seq")
        if self.config.per_host_wave_budget is not None:
            take = pool.groupby("host", sort=False).head(self.config.per_host_wave_budget)
        else:
            take = pool
        if self.config.max_pages is not None:
            take = take.head(max(0, self.config.max_pages - self.pages_fetched))
        self.pool = pool[~pool["seq"].isin(take["seq"])]
        return take.reset_index(drop=True)

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

        wave_ds = rd.from_pandas(wave_df)
        fetched = wave_ds.map_batches(
            Fetcher,
            fn_constructor_kwargs={"store_ref": self.store_ref, "delay": cfg.politeness_delay},
            batch_format="pyarrow", batch_size=cfg.fetch_batch_size,
            concurrency=(1, cfg.fetch_concurrency), num_cpus=0.25,
        )
        ngram_size = cfg.ngram_size
        validated = fetched.map_batches(
            lambda b: _validate_batch(b, ngram_size), batch_format="pyarrow",
        ).materialize()

        # ---- content gate: compact fingerprints only, in seq order --------
        fp = validated.select_columns(
            ["seq", "status", "integrity_ok", "shingles", "phash"]
        ).to_pandas().sort_values("seq")
        live = fp[(fp["status"] == 200) & fp["integrity_ok"]]
        gate_rows = [
            (int(s), [int(x) for x in sh], int(ph))
            for s, sh, ph in zip(live["seq"], live["shingles"], live["phash"])
        ]
        gate_out = ray.get(self.content_gate.process.remote(gate_rows))
        decision = {}
        for (s, _sh, _ph), d in zip(gate_rows, gate_out):
            decision[s] = d
        for s, st, iok in zip(fp["seq"], fp["status"], fp["integrity_ok"]):
            if int(s) not in decision:
                decision[int(s)] = "error" if (st != 200 or not iok) else "accept"

        self.pages_fetched += len(fp)

        # ---- crawl order record ------------------------------------------
        order_df = wave_df[["seq", "url_norm"]].copy()
        order_df["wave"] = np.int32(self.wave)  # fetch wave (≠ discovery wave in budget mode)
        order_df["status"] = order_df["seq"].map(
            dict(zip(fp["seq"].astype(int), fp["status"].astype(int)))
        )
        order_df["decision"] = order_df["seq"].map(decision)
        self.crawl_order_frames.append(order_df)

        # ---- pages sink (accepted payload rows) ---------------------------
        accepted_seqs = {s for s, d in decision.items() if d == "accept"}
        seq_ref = ray.put(accepted_seqs)

        def keep_accepted(b: pa.Table) -> pa.Table:
            acc = ray.get(seq_ref)
            mask = pa.array([int(s) in acc for s in b["seq"].to_pylist()])
            return b.filter(mask)

        accepted_ds = validated.map_batches(keep_accepted, batch_format="pyarrow")
        pages_dir = None
        if cfg.checkpoint_dir:
            pages_dir = os.path.join(cfg.checkpoint_dir, "pages", f"wave={self.wave}")
            tmp = pages_dir + ".tmp"
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            accepted_pages_ds = accepted_ds.select_columns(
                ["image_id", "bytes", "w", "h", "fmt", "caption", "phash",
                 "url_norm", "wave", "seq"]
            )
            accepted_pages_ds.write_parquet(tmp)
            os.makedirs(tmp, exist_ok=True)  # write_parquet creates nothing for 0 rows
            if os.path.exists(pages_dir):
                shutil.rmtree(pages_dir)
            os.replace(tmp, pages_dir)

        # ---- link pipeline ------------------------------------------------
        allowed = cfg.allowed_domains
        links_ds = accepted_ds.select_columns(["seq", "url_norm", "links"]).map_batches(
            lambda b: _explode_links(b, allowed), batch_format="pyarrow",
        ).materialize()

        link_counts = {"candidates": links_ds.count()}
        if link_counts["candidates"] > 0:
            hosts = list({h for h in links_ds.select_columns(["host"]).to_pandas()["host"]})
            rules = ray.get(self.robots.disallowed_prefixes.remote(hosts)) if cfg.use_robots else {}
            rules_ref = ray.put(rules)

            def robots_filter(b: pa.Table) -> pa.Table:
                rl = ray.get(rules_ref)
                mask = []
                for u, h in zip(b["url_norm"].to_pylist(), b["host"].to_pylist()):
                    path = "/" + u.split("/", 3)[3] if u.count("/") >= 3 else "/"
                    mask.append(not any(path.startswith(p) for p in rl.get(h, ())))
                return b.filter(pa.array(mask))

            gated_input = links_ds.map_batches(robots_filter, batch_format="pyarrow")

            gates = self.gates
            nshards = cfg.num_gate_shards

            def host_gate(g: pd.DataFrame) -> pd.DataFrame:
                g = g.sort_values(["parent_seq", "link_idx"])
                host = g["host"].iloc[0]
                shard = _host_shard(host, nshards)
                rows = list(zip(g["host"], g["url_norm"], g["url_hash"]))
                out = ray.get(gates[shard].process.remote(rows))
                g = g.copy()
                g["decision"] = out
                return g

            gate_res = gated_input.groupby("host").map_groups(
                host_gate, batch_format="pandas"
            ).to_pandas()
        else:
            gate_res = pd.DataFrame(
                columns=["parent_seq", "link_idx", "url_norm", "url_hash", "host", "decision"]
            )

        # ---- frontier(w+1): FIFO seq assignment ---------------------------
        accepted_links = gate_res[gate_res["decision"] == "accept"].sort_values(
            ["parent_seq", "link_idx"]
        ).reset_index(drop=True)
        new_rows = pd.DataFrame({
            "seq": self.next_seq + np.arange(len(accepted_links), dtype=np.int64),
            "url_norm": accepted_links["url_norm"],
            "host": accepted_links["host"],
            "wave": np.int32(self.wave + 1),
        })
        self.next_seq += len(accepted_links)
        self.pool = pd.concat([self.pool, new_rows], ignore_index=True)

        # ---- metrics ------------------------------------------------------
        from collections import Counter

        page_dec = Counter(order_df["decision"])
        link_dec = Counter(gate_res["decision"]) if len(gate_res) else Counter()
        wall = time.monotonic() - t0
        metric = {
            "wave": self.wave,
            "fetched": int(len(fp)),
            "pages_per_sec": round(len(fp) / wall, 2) if wall > 0 else None,
            "wall_sec": round(wall, 3),
            "page_decisions": dict(page_dec),
            "link_candidates": int(link_counts["candidates"]),
            "link_decisions": dict(link_dec),
            "frontier_pending": int(len(self.pool)),
            "next_seq": int(self.next_seq),
        }
        self.metrics.append(metric)

        if cfg.checkpoint_dir:
            self._checkpoint(order_df, metric)
        self.wave += 1
        return True

    # ------------------------------------------------------------ checkpoint
    def _checkpoint(self, order_df: pd.DataFrame, metric: dict) -> None:
        d = self.config.checkpoint_dir
        storage.write_table_atomic(
            pa.Table.from_pandas(order_df, preserve_index=False),
            os.path.join(d, "crawl_order", f"wave={self.wave}"),
        )
        storage.write_table_atomic(
            pa.Table.from_pandas(self.pool, preserve_index=False),
            os.path.join(d, "frontier", f"wave={self.wave + 1}"),
        )
        host_dumps = ray.get([g.dump.remote() for g in self.gates])
        storage.write_json_atomic(
            {"shards": host_dumps},
            os.path.join(d, "state", f"wave={self.wave}", "hostgates.json"),
        )
        storage.write_json_atomic(
            ray.get(self.content_gate.dump.remote()),
            os.path.join(d, "state", f"wave={self.wave}", "contentgate.json"),
        )
        storage.write_json_atomic(metric, os.path.join(d, "metrics", f"wave={self.wave}.json"))
        storage.write_json_atomic(
            {"completed_wave": self.wave, "next_seq": self.next_seq,
             "pages_fetched": self.pages_fetched,
             "config_hash": self.config.config_hash()},
            os.path.join(d, "manifest.json"),
        )

    def _restore(self, manifest: dict) -> None:
        d = self.config.checkpoint_dir
        w = manifest["completed_wave"]
        if manifest["config_hash"] != self.config.config_hash():
            raise ValueError("checkpoint was written under different crawl semantics")
        self.wave = w + 1
        self.next_seq = manifest["next_seq"]
        self.pages_fetched = manifest["pages_fetched"]
        self.pool = storage.read_table(os.path.join(d, "frontier", f"wave={w + 1}")).to_pandas()
        host_state = storage.read_json(os.path.join(d, "state", f"wave={w}", "hostgates.json"))
        ray.get([
            g.restore.remote(s) for g, s in zip(self.gates, host_state["shards"])
        ])
        ray.get(self.content_gate.restore.remote(
            storage.read_json(os.path.join(d, "state", f"wave={w}", "contentgate.json"))
        ))
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
        order = (
            pd.concat(self.crawl_order_frames, ignore_index=True)
            .sort_values(["wave", "seq"]).reset_index(drop=True)
            if self.crawl_order_frames else pd.DataFrame()
        )
        dumps = ray.get([g.dump.remote() for g in self.gates])
        seen: set[str] = set()
        for s in dumps:
            seen.update(s["seen_hashes"])
        accepted = (
            order[order["decision"] == "accept"]["url_norm"].tolist()
            if len(order) else []
        )
        return CrawlResult(
            crawl_order=order,
            url_seen=seen,
            accepted_pages=accepted,
            metrics=self.metrics,
            pages_dir=os.path.join(self.config.checkpoint_dir, "pages")
            if self.config.checkpoint_dir else None,
        )

    def shutdown(self) -> None:
        for g in self.gates:
            ray.kill(g)
        ray.kill(self.content_gate)
        ray.kill(self.robots)
