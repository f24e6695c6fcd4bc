"""Long-lived gate actors — the crawl's cross-wave mutable state.

Three actor families replace the reference's lock-guarded module globals
(SURVEY.md §2.3):

- ``HostGateShard`` (T5/D3/D4): URL-seen set + per-host trap detector,
  sharded by ``hash(host) % num_shards``.  URL similarity is 0 across hosts
  (link_similarity.py:106-112), so host-sharding is EXACTLY the reference's
  global seen-set semantics.  Exact dedup uses a cuckoo filter fast path
  ("definitely new" has no false negatives) backed by an exact hash set.
- ``ContentGate`` (T4/D5): accepted-page shingle store + phash store.  A new
  page is rejected when (a) caption-shingle Jaccard vs ANY accepted page
  exceeds ``max_similarity`` (ngrams.py:88-101) or (b) image phash within
  ``max_hamming`` of ANY accepted image.  Candidates are found via an
  inverted shingle index (any pair with Jaccard > 0 shares ≥1 shingle —
  exact, no O(N²) scan) and pigeonhole phash bands (hamming ≤ t ⇒ ≥1 equal
  band of t+1) — provably the same accept/reject set as the reference's
  sequential loop, in the same order (SURVEY.md §7 hard part 2).
- ``RobotsCache``: per-host robots rules cache (north-star component); rules
  are supplied by the fetch layer (synthetic store in tests) and cached.

Checkpointing is INCREMENTAL: ``dump_delta``/``restore_replay`` move only
each wave's admits (O(wave)); resume is bit-identical because every decision
is content-derived and ordered by the deterministic FIFO ``seq`` (SURVEY.md
§7 hard part 6).  Result-time state exports are streaming: ``dump_seen_to``
writes each shard's seen set actor-side (the driver handles only paths and
counts) and ``contains_hashes`` answers bounded membership probes.
"""

from __future__ import annotations

from collections import defaultdict

import ray

from searchengine_ray.functions.linksim import TrapIndex
from searchengine_ray.functions.phash import hamming64, phash_bands
from searchengine_ray.state.cuckoo import CuckooFilter
from searchengine_ray.state.seenset import SeenSet


@ray.remote(num_cpus=0.5)
class HostGateShard:
    """Seen-set + trap gate for the hosts hashing to this shard.

    The trap check uses ``TrapIndex`` — exact sub-quadratic equivalent of
    the reference's all-pairs scan (the reference corpus's 58%-skew host
    would otherwise make this gate O(N²) on one shard).

    Memory discipline (the 10^10 design point): the exact seen set is a
    ``SeenSet`` of raw 32-byte digests in sorted numpy segments (~32 B/URL
    amortized, binary-search probes) behind the cuckoo fast path — never a
    Python set of hex strings; URL strings are not retained at all (the
    TrapIndex holds only path structure, with duplicate last-segment
    charsets collapsed)."""

    def __init__(self, shard_id: int, url_similarity_threshold: float = 0.85,
                 track_deltas: bool = False):
        self.shard_id = shard_id
        self.threshold = url_similarity_threshold
        self.seen = SeenSet(digest_size=32)
        self.cuckoo = CuckooFilter(capacity=1 << 20)
        self.cuckoo_degraded = False  # True → fast path off, exact set only
        self.trap_index = TrapIndex(url_similarity_threshold)
        # incremental-checkpoint support: admits since the last dump_delta
        # (only tracked when the engine checkpoints — unbounded otherwise)
        self.track_deltas = track_deltas
        self._delta: list[tuple[str, str, str]] = []
        # per-partition dedup-rate lineage (north-star metric): cumulative
        # decision counts for this shard's slice of the URL space
        self.decisions = {"accept": 0, "dup": 0, "trap": 0, "seed": 0}

    @staticmethod
    def _cuckoo_key(digest: bytes) -> int:
        return int.from_bytes(digest[:8], "big")

    def seed(self, rows: list[tuple[str, str, str]]) -> list[bool]:
        """Seed URLs enter dedup but bypass the trap gate (they never pass
        through the scraper in the reference flow)."""
        out = []
        for _host, url_norm, url_hash in rows:
            if bytes.fromhex(url_hash) in self.seen:
                out.append(False)
                continue
            self._admit(_host, url_norm, url_hash)
            self.decisions["seed"] += 1
            out.append(True)
        return out

    def process(self, rows: list[tuple[str, str, str]]) -> list[str]:
        """Gate candidate links IN ORDER.  rows: (host, url_norm, url_hash),
        pre-sorted by discovery order.  Returns one decision per row:
        'accept' | 'dup' | 'trap'."""
        out = []
        dec = self.decisions
        for host, url_norm, url_hash in rows:
            digest = bytes.fromhex(url_hash)
            if not self.cuckoo_degraded and not self.cuckoo.contains(
                self._cuckoo_key(digest)
            ):
                pass  # definitely new — skip the exact-set lookup
            elif digest in self.seen:
                dec["dup"] += 1
                out.append("dup")
                continue
            if self.trap_index.is_trap(url_norm):
                dec["trap"] += 1
                out.append("trap")
                continue
            self._admit(host, url_norm, url_hash)
            dec["accept"] += 1
            out.append("accept")
        return out

    def _admit(self, host: str, url_norm: str, url_hash: str) -> None:
        if self.track_deltas:
            self._delta.append((host, url_norm, url_hash))
        digest = bytes.fromhex(url_hash)
        self.seen.add(digest)
        if not self.cuckoo_degraded and not self.cuckoo.add(
            self._cuckoo_key(digest)
        ):
            # filter full: a dropped key would break the "definitely new"
            # fast path (a seen URL could skip the exact-set check) —
            # regrow 4× and rehash; if even the regrown filter rejects
            # (pathological key distribution), disable the fast path: the
            # exact set remains the source of truth either way
            self.cuckoo = CuckooFilter(capacity=4 * self.cuckoo.table.size)
            for d in self.seen:
                if not self.cuckoo.add(self._cuckoo_key(d)):
                    self.cuckoo_degraded = True
                    break
        self.trap_index.add(url_norm)

    def seen_count(self) -> int:
        return len(self.seen)

    def memory_stats(self) -> dict:
        """Per-structure resident-byte estimates — the per-partition lineage
        for the bounded-state invariant (recorded by scripts/run_crawl_job)."""
        n_cand = sum(self.decisions[k] for k in ("accept", "dup", "trap"))
        return {
            "shard_id": self.shard_id,
            "seen_count": len(self.seen),
            "seen_bytes": self.seen.nbytes(),
            "seen_segments": len(self.seen.segments),
            "cuckoo_bytes": int(self.cuckoo.table.nbytes),
            "trap_groups": len(self.trap_index.groups),
            # per-partition dedup-rate lineage (north-star metric)
            "decisions": dict(self.decisions),
            "dedup_rate": (round((self.decisions["dup"] + self.decisions["trap"])
                                 / n_cand, 6) if n_cand else 0.0),
        }

    def dump_seen_to(self, path: str) -> int:
        """Write this shard's seen URL hashes as ONE sorted table at
        ``path`` (Lance/parquet via the storage seam) — executed actor-side,
        so the driver never receives the set (the streaming replacement for
        the old full-dump RPC).  Returns the row count."""
        import pyarrow as pa

        from searchengine_ray.sources import storage

        hashes = [d.hex() for d in self.seen.sorted_digests()]
        storage.write_table_atomic(
            pa.table({"url_hash": pa.array(hashes, pa.string())}), path)
        return len(hashes)

    def contains_hashes(self, url_hashes: list[str]) -> list[bool]:
        """Membership probe — the bounded-RPC alternative to shipping the
        seen set to the caller."""
        return [bytes.fromhex(h) in self.seen for h in url_hashes]

    def dump_delta(self) -> dict:
        """Admits since the last dump_delta — the O(wave) checkpoint unit.
        Carries the CUMULATIVE decision counters (O(1)) so resumed crawls
        keep the full dedup-rate lineage, not a since-resume view."""
        d = {"shard_id": self.shard_id, "rows": [list(r) for r in self._delta],
             "decisions": dict(self.decisions)}
        self._delta = []
        return d

    def restore_replay(self, rows: list, decisions: dict | None = None) -> None:
        """Replay checkpointed admit deltas IN ORDER — rebuilds seen set,
        cuckoo and trap index exactly (same _admit path).  ``decisions``:
        the cumulative counter snapshot from the same delta; deltas replay
        in wave order so the last snapshot wins (old checkpoints without it
        fall back to since-resume counters)."""
        for host, url_norm, url_hash in rows:
            self._admit(host, url_norm, url_hash)
        if decisions is not None:
            self.decisions = dict(decisions)
        self._delta = []

class WaveGate:
    """Sequential content near-dup gate over ONE wave's rows — dict-backed,
    TRANSIENT, bounded by the wave and never the corpus.  The reference's
    sequential loop semantics (ngrams.py:88-101) for the intra-wave part:
    an inverted shingle index + phash-band buckets keep each decision
    O(candidates).  The cross-wave store of record is the numpy-segment
    ``ContentGateCore``; the driver-side wave resolvers
    (stages/content_probe.resolve_wave / resolve_wave_split) use this class
    directly for their (typically tiny) interacting subsets."""

    def __init__(self, max_similarity: float = 0.65, max_hamming: int = 4):
        self.max_similarity = max_similarity
        self.max_hamming = max_hamming
        self.num_bands = max_hamming + 1
        self.page_shingles: dict[int, frozenset[int]] = {}
        self.shingle_index: dict[int, list[int]] = defaultdict(list)
        self.page_phash: dict[int, int] = {}
        # band bucket → list of phashes (as python ints); numpy-vectorized
        # scan per probe — existence of a close hash is all the gate needs
        self.phash_bands: dict[tuple[int, int], list[int]] = defaultdict(list)

    def text_dup(self, sset: frozenset[int]) -> bool:
        if not sset:
            return False
        cand: set[int] = set()
        for sh in sset:
            cand.update(self.shingle_index.get(sh, ()))
        for page in cand:
            prev = self.page_shingles[page]
            inter = len(sset & prev)
            union = len(sset | prev)
            if union and inter / union > self.max_similarity:
                return True
        return False

    def image_dup(self, ph: int) -> bool:
        import numpy as np

        from searchengine_ray.functions.phash import hamming64_vec

        t = self.max_hamming
        for band in phash_bands(ph, self.num_bands):
            bucket = self.phash_bands.get(band)
            if not bucket:
                continue
            if len(bucket) <= 16:
                if any(hamming64(ph, q) <= t for q in bucket):
                    return True
            else:
                arr = np.fromiter(bucket, dtype=np.int64, count=len(bucket))
                if (hamming64_vec(arr, ph) <= t).any():
                    return True
        return False

    def admit(self, seq: int, sset: frozenset[int], ph: int) -> None:
        self.page_shingles[seq] = sset
        for sh in sset:
            self.shingle_index[sh].append(seq)
        self.page_phash[seq] = ph
        for band in phash_bands(ph, self.num_bands):
            self.phash_bands[band].append(ph)


class ContentGateCore:
    """Cross-wave content near-dup STORE OF RECORD (caption shingles +
    image phash) — the broadcast/checkpoint-mode counterpart of the probe
    tier, now with the same numpy memory discipline: resident state is one
    ``StoreIndex`` of compact sorted-array segments (~150 B/page — the
    shape measured on the probe replicas), never per-page Python
    dict/frozenset structures (r3 'What's missing' #5).

    A ``process`` call decomposes exactly like the wave resolvers: the
    store part of every verdict probes the index BATCH-vectorized (store
    state cannot change mid-call — all intra-call admits land in a
    transient ``WaveGate`` overlay), then a sequential overlay walk
    resolves intra-call interactions.  Verdicts are identical to the
    one-row-at-a-time sequential gate (same argument as resolve_wave;
    pinned by the crawl conformance suite on the inline path).

    Shingle lists are DISTINCT by construction (``shingle_hashes`` yields
    sets) — set sizes for the Jaccard test come from list lengths."""

    def __init__(self, max_similarity: float = 0.65, max_hamming: int = 4):
        from searchengine_ray.stages.content_probe import StoreIndex

        self.max_similarity = max_similarity
        self.max_hamming = max_hamming
        self.num_bands = max_hamming + 1
        self.index = StoreIndex(max_hamming)
        self._n = 0

    def process(self, rows: list[tuple[int, list[int], int]]) -> list[str]:
        """rows: (seq, shingle_hashes, phash) sorted by seq.  Returns
        'accept' | 'text_dup' | 'image_dup' per row."""
        import numpy as np
        import pyarrow as pa

        from searchengine_ray.stages.content_probe import _flatten_live

        n = len(rows)
        if not n:
            return []
        shingle_lists = [r[1] for r in rows]
        phashes = [int(r[2]) for r in rows]
        flat, offsets, ph = _flatten_live(
            shingle_lists, phashes, np.arange(n, dtype=np.int64))
        store_text = self.index.text_dup_batch(flat, offsets,
                                               self.max_similarity)
        store_image = self.index.image_dup_batch(ph)

        ov = WaveGate(self.max_similarity, self.max_hamming)
        out: list[str] = []
        admitted: list[int] = []
        for i, (seq, shingles, phv) in enumerate(rows):
            sset = frozenset(shingles)
            if store_text[i] or ov.text_dup(sset):
                out.append("text_dup")
                continue
            if store_image[i] or ov.image_dup(int(phv)):
                out.append("image_dup")
                continue
            ov.admit(int(seq), sset, int(phv))
            admitted.append(i)
            out.append("accept")
        if admitted:
            tbl = pa.table({
                "seq": pa.array([int(rows[i][0]) for i in admitted], pa.int64()),
                "shingles": pa.array([list(rows[i][1]) for i in admitted],
                                     pa.list_(pa.int64())),
                "phash": pa.array([int(rows[i][2]) for i in admitted],
                                  pa.int64()),
            })
            self.index.add_table(tbl)
            self._n += len(admitted)
        return out

    def process_table(self, fp_table) -> list[str]:
        """Arrow-table variant of ``process`` (zero-copy through the object
        store; column-wise to_pylist is ~10× cheaper than pandas list-column
        conversion on the caller side).  Columns: seq, shingles, phash —
        already sorted by seq."""
        seqs = fp_table["seq"].to_pylist()
        shingles = fp_table["shingles"].to_pylist()
        phashes = fp_table["phash"].to_pylist()
        return self.process(list(zip(seqs, shingles, phashes)))

    def bulk_admit(self, fp_table) -> int:
        """Insert pre-resolved accepted pages (order-independent once the
        wave's decisions are fixed) — one compact segment per delta table,
        no per-row Python."""
        self.index.add_table(fp_table)
        self._n += fp_table.num_rows
        return fp_table.num_rows

    def accepted_count(self) -> int:
        return self._n

    def memory_stats(self) -> dict:
        """Resident-byte lineage — same shape as the probe shards'."""
        return {"accepted": self._n,
                "index_bytes": self.index.nbytes(),
                "segments": len(self.index.segments)}


@ray.remote(num_cpus=0.5)
class ContentGate(ContentGateCore):
    """Actor form of ContentGateCore — the cross-wave store of record
    (checkpoints, inline path); big waves resolve driver-side against the
    broadcast snapshot and sync back via bulk_admit."""


@ray.remote(num_cpus=0.25)
class ContentProbeShard:
    """One shard of the content-store probe TIER — the 10^10-scale
    replacement for the per-worker broadcast ``StoreIndex`` replica
    (VERDICT r2 'What's missing' #1; SCALE.md sharded-probe design).

    Sharding is by store ROW (``seq % num_shards``): each shard holds a
    complete ``StoreIndex`` over its 1/N slice of accepted pages, so a
    probe against one shard is EXACT for that slice (jaccard shared-counts
    never straddle shards — the alternative, sharding by shingle value,
    would force cross-shard partial-count sums per candidate pair).  A
    batch's fingerprints are sent to every shard and the per-shard flags OR
    together; probe payload is the WAVE's fingerprints (small) × N, while
    resident state per shard is O(corpus/N) — the trade that scales."""

    def __init__(self, shard_id: int, num_shards: int, max_hamming: int):
        from searchengine_ray.stages.content_probe import StoreIndex

        self.shard_id = shard_id
        self.num_shards = num_shards
        self.index = StoreIndex(max_hamming)

    def add_table(self, tbl) -> int:
        """Ingest accepted-page fingerprints (caller pre-routes rows with
        seq % num_shards == shard_id)."""
        self.index.add_table(tbl)
        return tbl.num_rows

    def add_table_sliced(self, tbl) -> int:
        """Ingest only this shard's rows (seq % num_shards == shard_id)
        from an UNROUTED block — the distributed-admit path, where no
        single process ever holds the wave's delta (blocks are shipped by
        ref; each shard filters its slice plasma-side)."""
        import numpy as np
        import pyarrow as pa

        shards = np.asarray(
            tbl["seq"].to_numpy(zero_copy_only=False)) % self.num_shards
        m = shards == self.shard_id
        if not m.any():
            return 0
        sub = tbl.filter(pa.array(m))
        self.index.add_table(sub)
        return sub.num_rows

    def probe(self, flat, offsets, phashes, max_sim: float):
        """(text_dup, image_dup) flags vs this shard's slice for a batch of
        candidates given as concatenated shingle hashes + offsets + phashes
        (the ``probe_batch`` wire format)."""
        return (self.index.text_dup_batch(flat, offsets, max_sim),
                self.index.image_dup_batch(phashes))

    def accepted_count(self) -> int:
        return sum(s.n for s in self.index.segments)

    def memory_stats(self) -> dict:
        return {"shard_id": self.shard_id,
                "accepted": self.accepted_count(),
                "index_bytes": self.index.nbytes(),
                "segments": len(self.index.segments)}


@ray.remote(num_cpus=0.25)
class RobotsCache:
    """Per-host robots rules cache.  ``rules_source`` is a dict
    host → list of disallowed path prefixes (the synthetic stand-in for
    fetching /robots.txt; a real deployment plugs an HTTP fetcher here)."""

    def __init__(self, rules_source: dict[str, list[str]] | None = None):
        self.rules_source = rules_source or {}
        self.cache: dict[str, tuple[str, ...]] = {}
        self.misses = 0

    def disallowed_prefixes(self, hosts: list[str]) -> dict[str, tuple[str, ...]]:
        out = {}
        for h in hosts:
            if h not in self.cache:
                self.misses += 1
                self.cache[h] = tuple(self.rules_source.get(h, ()))
            out[h] = self.cache[h]
        return out

    def stats(self) -> dict:
        return {"cached_hosts": len(self.cache), "misses": self.misses}
