"""Deterministic synthetic web graph of image+caption pages (FIXTURES.md F1/F2).

The stand-in for the reference's live cache server (utils/download.py:7-21):
a page store mapping normalized URL → record with

  (url, host, status, links: list[str], caption: str, bytes: binary,
   w: int32, h: int32, fmt: 'png'|'jpeg', phash: int64, pixels ref)

Planted structures (mirroring the measured reference corpus + README rules):
- host skew: host0 holds ~60% of pages (DEV/www_ics_uci_edu ≈ 58%);
- crawler traps: date-enumerating URL families
  ``/events/day/2013-08-NN/`` (golden case link_similarity.py:203-206) —
  each trap page links to the next date;
- exact URL duplicates: http/https + trailing-slash + #fragment variants;
- invalid links: .pdf/.css/mailto/ftp/off-domain (README.md:209-213);
- caption near-dups (3-gram Jaccard > 0.65) and image near-dups
  (phash hamming ≤ 4), plus exact image dups;
- robots: host1 disallows the ``/private/`` prefix;
- non-200 pages (404 + cache-server 600-606 style codes, README.md:89-92).

Everything derives from ``seed`` — no wall clock, no global RNG.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from searchengine_ray.functions.imagecodec import encode
from searchengine_ray.functions.phash import phash64


@dataclass
class SyntheticStore:
    pages: dict[str, dict] = field(default_factory=dict)  # url_norm → record
    robots: dict[str, list[str]] = field(default_factory=dict)
    seeds: list[str] = field(default_factory=list)
    originals: dict[str, np.ndarray] = field(default_factory=dict)  # url → pixels


def _caption(rng: np.random.RandomState, vocab: list[str], n: int = 12) -> str:
    return " ".join(vocab[i] for i in rng.randint(0, len(vocab), n))


def _perturb_caption(rng: np.random.RandomState, caption: str) -> str:
    """Append one word: a 12-word caption has 4 non-overlapping 3-gram
    shingles (stride 3, ngrams.py:35); appending a 13th word keeps all 4 and
    adds 1 partial → Jaccard 4/5 = 0.8 > the 0.65 reject line, so the gate
    MUST fire on these planted near-dups."""
    return caption + " " + VOCAB[int(rng.randint(0, len(VOCAB)))]


def _image(rng: np.random.RandomState, w: int, h: int) -> np.ndarray:
    base = rng.randint(0, 255, size=(4, 4, 3), dtype=np.uint8)
    return np.repeat(np.repeat(base, h // 4 + 1, 0), w // 4 + 1, 1)[:h, :w]


def _near_dup_image(rng: np.random.RandomState, pixels: np.ndarray) -> np.ndarray:
    out = pixels.astype(np.int16) + rng.randint(-2, 3, size=pixels.shape)
    return np.clip(out, 0, 255).astype(np.uint8)


VOCAB = (
    "student campus engineering library sunset building group photo lab "
    "research robot data class professor hall lecture garden bridge river "
    "autumn winter spring summer festival club sports game music art theater"
).split()


@dataclass(frozen=True)
class ProceduralSpec:
    """A page universe computed from the URL instead of stored — the way to
    exercise 10^10-frontier-scale behavior without 10^10 rows of fixture.

    Topology: page 0 (the seed) links to all hub pages; hub j links to leaf
    pages [j·chunk, (j+1)·chunk); leaves link nowhere → a 3-wave crawl whose
    last wave is one giant frontier slice (the scaling-bench shape).
    Every payload is deterministic in (seed, page id)."""

    n_pages: int = 100_000
    n_hosts: int = 16
    chunk: int = 256
    img_edge: int = 96
    seed: int = 777

    def url(self, i: int) -> str:
        # one directory per page: same-directory numeric ids would (correctly)
        # trip the reference's trap detector — the scaling universe must not
        return f"https://host{i % self.n_hosts}.test/d{i}/p"

    def page_id(self, url: str) -> int | None:
        try:
            _, _, tail = url.partition(".test/d")
            i = int(tail.split("/")[0])
        except ValueError:
            return None
        if 0 <= i < self.n_pages and url == self.url(i):
            return i
        return None


def procedural_page(spec: ProceduralSpec, url: str) -> dict | None:
    """Generate the full page record for a URL (None for unknown URLs).
    Encoding happens here ("server side"); the crawler's validate stage
    re-decodes and re-hashes — the same work it would do on real fetches."""
    from searchengine_ray.functions.imagecodec import decode as _dec

    i = spec.page_id(url)
    if i is None:
        return None
    rng = np.random.RandomState((spec.seed * 1_000_003 + i) % (2**31 - 1))
    # full-res noise (not the 4×4 upsample of the conformance fixture):
    # upsampled images cluster in phash space and create pathological LSH
    # buckets at 10^5 pages; noise gives uniform bands
    px = rng.randint(0, 256, size=(spec.img_edge, spec.img_edge, 3), dtype=np.uint8)
    fmt = "png" if i % 2 == 0 else "jpeg"
    data = encode(px, fmt)
    caption = " ".join(
        VOCAB[j] for j in rng.randint(0, len(VOCAB), 12)
    ) + f" uid{i}"  # globally distinct → content gate stays O(1) per page
    n_hubs = (spec.n_pages + spec.chunk - 1) // spec.chunk
    if i == 0:
        links = [spec.url(spec.n_pages - 1 - h) for h in range(n_hubs)]
    else:
        # hubs are the last n_hubs page ids
        h = spec.n_pages - 1 - i
        if 0 <= h < n_hubs:
            lo = h * spec.chunk
            hi = min(lo + spec.chunk, spec.n_pages)
            links = [spec.url(j) for j in range(lo, hi) if j != 0]
        else:
            links = []
    return {
        "url": url,
        "host": f"host{i % spec.n_hosts}.test",
        "status": 200,
        "links": links,
        "caption": caption,
        "bytes": data,
        "w": spec.img_edge,
        "h": spec.img_edge,
        "fmt": fmt,
        "phash": phash64(_dec(data, fmt)),
    }


@dataclass
class ProceduralStore:
    """Store-shaped wrapper over a ProceduralSpec (drop-in for
    SyntheticStore in CrawlEngine: .seeds, .robots, and a fetch backend)."""

    spec: ProceduralSpec

    @property
    def seeds(self) -> list[str]:
        return [self.spec.url(0)]

    robots: dict = None

    def __post_init__(self):
        if self.robots is None:
            self.robots = {}


def make_store(
    n_pages: int = 120,
    n_hosts: int = 6,
    seed: int = 42,
    trap_len: int = 8,
    frac_near_dup_caption: float = 0.08,
    frac_near_dup_image: float = 0.06,
    frac_dead: float = 0.08,
    fanout: int = 4,
    img_min: int = 16,
    img_max: int = 48,
    captions: list[str] | None = None,
) -> SyntheticStore:
    """Build the synthetic crawl universe.  Deterministic in ``seed``.
    ``fanout`` = same-host outlinks per page (graph breadth → wave width);
    ``img_min/img_max`` = image edge range (decode/phash cost knob);
    ``captions`` = optional source texts (e.g. the testdata documents
    table) assigned to pages in order before near-dup planting."""
    rng = np.random.RandomState(seed)
    store = SyntheticStore()
    hosts = [f"host{i}.test" for i in range(n_hosts)]
    store.robots = {"host1.test": ["/private/"]}

    # --- page URL universe, skewed: host0 ≈ 60% ---------------------------
    weights = np.array([0.6] + [0.4 / (n_hosts - 1)] * (n_hosts - 1))
    page_hosts = [hosts[i] for i in rng.choice(n_hosts, size=n_pages, p=weights)]
    urls = []
    per_host_counter: dict[str, int] = {}
    for h in page_hosts:
        i = per_host_counter.get(h, 0)
        per_host_counter[h] = i + 1
        section = ["news", "people", "research", "blog"][i % 4]
        urls.append(f"https://{h}/{section}/page{i}")
    # trap family on host0 (date enumeration)
    trap_urls = [
        f"https://host0.test/events/day/2013-08-{10 + i:02d}/" for i in range(trap_len)
    ]
    # private (robots-disallowed) pages on host1
    private_urls = [f"https://host1.test/private/page{i}" for i in range(3)]

    all_real = urls + trap_urls + private_urls

    # --- captions + images -------------------------------------------------
    caption_pool = captions
    captions = {}
    pixels: dict[str, np.ndarray] = {}
    for j, u in enumerate(all_real):
        if caption_pool:
            captions[u] = caption_pool[j % len(caption_pool)]
        else:
            captions[u] = _caption(rng, VOCAB)
        pixels[u] = _image(rng, int(rng.randint(img_min, img_max)),
                           int(rng.randint(img_min, img_max)))

    # plant caption near-dups / image near-dups / exact image dups among the
    # regular pages (never the first page of a host, so seeds stay clean)
    regular = urls[1:]
    n_cap = int(len(regular) * frac_near_dup_caption)
    n_img = int(len(regular) * frac_near_dup_image)
    cap_dups = [regular[i] for i in rng.choice(len(regular), n_cap, replace=False)]
    img_pool = [u for u in regular if u not in cap_dups]
    img_dups = [img_pool[i] for i in rng.choice(len(img_pool), n_img, replace=False)]
    for u in cap_dups:
        src = urls[rng.randint(0, len(urls) // 2)]
        if src != u:
            captions[u] = _perturb_caption(rng, captions[src])
    for k, u in enumerate(img_dups):
        src = urls[rng.randint(0, len(urls) // 2)]
        if src == u:
            continue
        pixels[u] = (
            pixels[src].copy() if k % 2 == 0 else _near_dup_image(rng, pixels[src])
        )

    # --- statuses ----------------------------------------------------------
    dead = set(
        np.array(regular)[rng.choice(len(regular), int(len(regular) * frac_dead), replace=False)]
    )

    # --- link structure ----------------------------------------------------
    def variants(u: str) -> list[str]:
        """Duplicate/noise variants of a target link."""
        vs = [u]
        r = rng.randint(0, 4)
        if r == 0:
            vs.append(u.replace("https://", "http://"))
        elif r == 1:
            vs.append(u + "/")
        elif r == 2:
            vs.append(u + "#section")
        return vs

    by_host: dict[str, list[str]] = {}
    for u in urls:
        by_host.setdefault(u.split("/")[2], []).append(u)

    for idx, u in enumerate(all_real):
        host = u.split("/")[2]
        links: list[str] = []
        same = by_host.get(host, [])
        if same:
            for j in rng.choice(len(same), min(fanout, len(same)), replace=False):
                links.extend(variants(same[j]))
        other_hosts = [h for h in hosts if h != host]
        oh = other_hosts[rng.randint(0, len(other_hosts))]
        cand = by_host.get(oh, [])
        if cand:
            links.extend(variants(cand[rng.randint(0, len(cand))]))
        # noise links
        noise_choices = [
            f"https://{host}/files/report{idx}.pdf",
            f"https://{host}/style/main.css",
            "ftp://archive.test/data",
            "mailto:someone@test",
            f"https://offdomain.example.com/page{idx}",
        ]
        links.append(noise_choices[rng.randint(0, len(noise_choices))])
        # trap entry + chain
        if u in trap_urls:
            i = trap_urls.index(u)
            if i + 1 < len(trap_urls):
                links = [trap_urls[i + 1]] + links
        elif host == "host0.test" and rng.random_sample() < 0.15:
            links.append(trap_urls[0])
        if host == "host1.test" and rng.random_sample() < 0.5:
            links.append(private_urls[rng.randint(0, len(private_urls))])

        status = 200
        if u in dead:
            status = int(rng.choice([404, 500, 600, 603, 606]))
        fmt = "png" if rng.random_sample() < 0.5 else "jpeg"
        px = pixels[u]
        data = encode(px, fmt)
        # phash over the DECODED payload pixels (what a consumer would see)
        from searchengine_ray.functions.imagecodec import decode as _dec

        norm = u.rstrip("/") if u.endswith("/") else u
        store.pages[norm] = {
            "url": norm,
            "host": host,
            "status": status,
            "links": links,
            "caption": captions[u],
            "bytes": data,
            "w": int(px.shape[1]),
            "h": int(px.shape[0]),
            "fmt": fmt,
            "phash": phash64(_dec(data, fmt)),
        }
        store.originals[norm] = px

    store.seeds = [urls[0], by_host.get("host1.test", [urls[0]])[0]]
    return store
