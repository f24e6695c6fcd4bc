"""Sequential conformance oracle for the crawl.

Implements the reference crawler's single-threaded semantics
(THREADCOUNT=1 — the shipped default posture, README.md:53-56; worker loop
README.md:196-203) over the synthetic page store, defining the golden
``crawl_order`` and final URL-seen set the Ray engine must reproduce
(BASELINE.json:north_rule; SURVEY.md §7 hard part 1).

Gate order per fetched page (reference flow §3.1):
1. fetch → non-200 ⇒ no content, no links (scraper returns [] for errors,
   README.md:104-106);
2. content near-dup gate: caption 3-gram shingle Jaccard vs ANY accepted
   page > 0.65 ⇒ page rejected, links NOT extracted (ngrams.py:142-164:
   ``should_read`` gates reading the page); then the graft's image gate:
   phash hamming ≤ 4 vs ANY accepted image ⇒ rejected likewise;
3. accepted ⇒ store fingerprints + payload; extract links IN PAGE ORDER:
   resolve → defragment (README.md:104-111) → is_valid (+ domain filter)
   → robots-disallow → normalize → urlhash-dedup (seen set,
   README.md:166-168) → URL-trap similarity vs the host's previously
   accepted URLs ≥ 0.85 ⇒ reject (link_similarity.py:162-163,225-230)
   → accept: append to frontier + seen set + host URL list.

Seeds enter the frontier through dedup only (they never pass the scraper).
Politeness pacing never reorders a FIFO queue, so ``politeness_delay`` does
not appear here; the optional ``per_host_wave_budget`` reproduces the wave
engine's budgeted schedule (k smallest-seq pending URLs per host per wave).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from searchengine_ray.config import CrawlConfig
from searchengine_ray.functions.linksim import link_similarity
from searchengine_ray.functions.ngrams import shingle_hashes
from searchengine_ray.functions.phash import hamming64
from searchengine_ray.functions.tokenizer import tokenize_fast
from searchengine_ray.sources.fixtures import SyntheticStore
from searchengine_ray.utils.urls import get_urlhash, is_valid, join_url, normalize, urldefrag_str


@dataclass
class OracleResult:
    crawl_order: list[dict] = field(default_factory=list)  # seq,url,wave,status,decision
    url_seen: set[str] = field(default_factory=set)  # url_hashes ever admitted
    accepted_pages: list[str] = field(default_factory=list)  # url_norm in seq order
    link_decisions: list[dict] = field(default_factory=list)


def crawl_oracle(store: SyntheticStore, config: CrawlConfig) -> OracleResult:
    res = OracleResult()
    seen: set[str] = set()
    host_urls: dict[str, list[str]] = {}
    accepted_shingles: list[frozenset[int]] = []
    accepted_phash: list[int] = []

    # frontier item: (seq, url_norm, host, wave, priority)
    frontier: list[tuple[int, str, str, int, float]] = []
    next_seq = 0

    def prio(url: str, host: str, depth: int) -> float:
        return config.priority_fn(url, host, depth) if config.priority_fn else 0.0

    def order_key(item):
        # priority DESC, then discovery FIFO (pure FIFO when priority_fn
        # is unset — every priority is 0.0)
        return (-item[4], item[0])

    def admit(url_norm: str, url_hash: str, host: str) -> None:
        seen.add(url_hash)
        host_urls.setdefault(host, []).append(url_norm)

    # --- seeds -------------------------------------------------------------
    for u in config.seed_urls:
        nu = normalize(urldefrag_str(u))
        h = get_urlhash(nu)
        host = nu.split("/")[2] if "//" in nu else ""
        if h in seen:
            continue
        admit(nu, h, host)
        frontier.append((next_seq, nu, host, 0, prio(nu, host, 0)))
        next_seq += 1

    pages_fetched = 0
    wave = 0
    while frontier:
        if config.max_waves is not None and wave >= config.max_waves:
            break
        # wave slice: full frontier, or the k best (priority desc, seq) per host
        if config.per_host_wave_budget is None:
            wave_items = sorted(frontier, key=order_key)
            frontier = []
        else:
            by_host: dict[str, list] = {}
            for item in sorted(frontier, key=order_key):
                by_host.setdefault(item[2], []).append(item)
            wave_items, rest = [], []
            for h, items in by_host.items():
                wave_items.extend(items[: config.per_host_wave_budget])
                rest.extend(items[config.per_host_wave_budget:])
            wave_items.sort(key=order_key)
            frontier = rest

        if config.max_pages is not None:
            remaining = config.max_pages - pages_fetched
            if remaining <= 0:
                break
            wave_items = wave_items[:remaining]

        discovered: list[tuple[int, str, str, int]] = []
        for seq, url_norm, host, _w, _p in wave_items:
            page = store.pages.get(url_norm)
            status = page["status"] if page else 404
            pages_fetched += 1
            decision = "accept"
            if page is None or status != 200:
                decision = "error"
            else:
                sset = frozenset(
                    shingle_hashes(tokenize_fast(page["caption"]), config.ngram_size)
                )
                if any(
                    (len(sset & prev) / len(sset | prev) if (sset | prev) else 0.0)
                    > config.content_max_similarity
                    for prev in accepted_shingles
                ):
                    decision = "text_dup"
                elif any(
                    hamming64(page["phash"], ph) <= config.phash_max_hamming
                    for ph in accepted_phash
                ):
                    decision = "image_dup"
                else:
                    accepted_shingles.append(sset)
                    accepted_phash.append(page["phash"])
                    res.accepted_pages.append(url_norm)
            res.crawl_order.append(
                {"seq": seq, "url": url_norm, "wave": wave, "status": status,
                 "decision": decision}
            )
            if decision != "accept":
                continue
            # --- link extraction in page order ----------------------------
            for idx, raw in enumerate(page["links"]):
                resolved = normalize(urldefrag_str(join_url(url_norm, raw)))
                why = None
                if not is_valid(resolved, config.allowed_domains) or (
                    config.extra_link_filter is not None
                    and not config.extra_link_filter(resolved)
                ):
                    why = "invalid"
                else:
                    lhost = resolved.split("/")[2]
                    lpath = "/" + resolved.split("/", 3)[3] if resolved.count("/") >= 3 else "/"
                    if config.use_robots and any(
                        lpath.startswith(p) for p in store.robots.get(lhost, ())
                    ):
                        why = "robots"
                    else:
                        lh = get_urlhash(resolved)
                        if lh in seen:
                            why = "dup"
                        elif any(
                            link_similarity(s, resolved) >= config.url_similarity_threshold
                            for s in host_urls.get(lhost, ())
                        ):
                            why = "trap"
                        else:
                            admit(resolved, lh, lhost)
                            discovered.append((
                                next_seq, resolved, lhost, wave + 1,
                                prio(resolved, lhost, wave + 1)))
                            next_seq += 1
                            why = "accept"
                res.link_decisions.append(
                    {"parent_seq": seq, "link_idx": idx, "url": resolved, "why": why}
                )
        frontier.extend(discovered)
        wave += 1

    res.url_seen = seen
    return res
