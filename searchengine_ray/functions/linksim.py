"""URL (link) similarity — the crawler-trap detector.

Reference: ``link_similarity.py`` —

- similarity is 0 unless scheme, netloc, hostname and port are all equal
  (``:106-112,125-126``);
- paths split on '/' with empties dropped (``:56-57``);
- when the two paths have the SAME length and are equal up to the last
  segment (``:48-52``), similarity = char-set Jaccard of the last segments
  (``:65-71``) — this is what fires 1.0 on date-enumerating trap URLs like
  ``.../day/2013-08-22/`` vs ``.../day/2013-08-23/`` (golden case
  ``:203-206``);
- otherwise similarity = consecutive-equal-prefix-length / max(len1, len2)
  (``:29-45,61-62``);
- a candidate URL is accepted for evaluation iff its similarity against
  EVERY already-seen URL is < ``URL_SIMILARITY_THRESHOLD = 0.85``
  (``:12,162-163,225-230``).

Edge case the reference would crash on (both paths empty → ``path1_list[-1]``
IndexError at ``:65``): defined here as 1.0 — same host with the same (empty)
path is the identical URL.
"""

from __future__ import annotations

from urllib.parse import urlparse

URL_SIMILARITY_THRESHOLD = 0.85  # reference link_similarity.py:12


def _path_parts(path: str) -> list[str]:
    return [p for p in path.split("/") if p]


def _consecutive_prefix(a: list[str], b: list[str]) -> int:
    """Count of leading equal segments (reference link_similarity.py:29-45)."""
    n = 0
    for x, y in zip(a, b):
        if x != y:
            break
        n += 1
    return n


def path_similarity_score(path1: str, path2: str) -> float:
    """Reference link_similarity.py:55-71."""
    p1, p2 = _path_parts(path1), _path_parts(path2)
    if not p1 and not p2:
        return 1.0  # see module docstring (reference would IndexError)
    if len(p1) == len(p2) and p1[:-1] == p2[:-1]:
        s1, s2 = set(p1[-1]), set(p2[-1])
        union = s1 | s2
        if not union:
            return 1.0
        return len(s1 & s2) / len(union)
    return _consecutive_prefix(p1, p2) / max(len(p1), len(p2))


def link_similarity(url1: str, url2: str) -> float:
    """Reference link_similarity.py:120-159 (``get_link_similarity``)."""
    a, b = urlparse(url1), urlparse(url2)
    if not (
        a.scheme == b.scheme
        and a.netloc == b.netloc
        and a.hostname == b.hostname
        and a.port == b.port
    ):
        return 0.0
    return path_similarity_score(a.path, b.path)


def should_evaluate_url(
    url1: str, url2: str, threshold: float = URL_SIMILARITY_THRESHOLD
) -> bool:
    """True when the pair is dissimilar enough to evaluate url2
    (reference link_similarity.py:162-163)."""
    return link_similarity(url1, url2) < threshold


def should_evaluate_against_seen(
    seen_urls, candidate: str, threshold: float = URL_SIMILARITY_THRESHOLD
) -> bool:
    """All-pairs gate vs the seen set (reference link_similarity.py:225-230).

    Cross-host pairs score 0, so callers shard the seen set by host and pass
    only same-host URLs — exactly equivalent, and it is what makes this gate
    partitionable at scale."""
    return all(should_evaluate_url(u, candidate, threshold) for u in seen_urls)


class TrapIndex:
    """Exact sub-quadratic index for the trap gate.

    ``is_trap(url)`` answers "∃ seen URL with link_similarity ≥ threshold"
    with EXACTLY the same accept/reject set as the brute-force scan
    (property-tested in tests/test_linksim.py), but in O(path_len) per
    probe instead of O(seen):

    - similarity is nonzero only within one (scheme, netloc) group
      (link_similarity.py:106-112) → top-level dict;
    - case A (same path length, equal prefix up to last segment → char-set
      Jaccard of last segments, :48-52,65-71): bucket by
      (len, parts[:-1]); a probe compares only same-directory entries,
      and only distinct last-segment charsets (a crawler-trap family has
      very few — date digits);
    - case B (otherwise → shared-prefix-len / max(len1,len2), :29-45,61-62):
      a path-prefix trie; each node keeps a histogram of the path lengths
      of seen URLs passing through, so divergers-at-depth-k and their
      lengths are read off during one walk, and the actual ``k/max``
      division is evaluated per distinct length (identical float semantics
      to the brute force).

    The reference's own crawl corpus shows why this matters: one host holds
    58% of pages (BASELINE.md) — the per-host gate must not be quadratic.
    """

    def __init__(self, threshold: float = URL_SIMILARITY_THRESHOLD):
        self.threshold = threshold
        # (scheme, netloc) → {"dirs": {(len, parts[:-1]): {charsets}},
        #                     "empty": int, "trie": node}
        # trie node = [children: dict[str, node], lengths: dict[int, int]]
        # "dirs" buckets are SETS of last-segment charsets: is_trap only
        # needs existence of a high-jaccard charset, so duplicates (a date
        # enumeration shares one ~10-char digit set across thousands of
        # URLs) collapse — memory rides distinct structure, not URL count
        self.groups: dict[tuple[str, str], dict] = {}
        self.n = 0  # admitted URL count (buckets dedupe, so count separately)

    @staticmethod
    def _parse(url: str):
        p = urlparse(url)
        return (p.scheme, p.netloc), _path_parts(p.path)

    def add(self, url: str) -> None:
        key, parts = self._parse(url)
        g = self.groups.get(key)
        if g is None:
            g = {"dirs": {}, "empty": 0, "trie": [{}, {}]}
            self.groups[key] = g
        lp = len(parts)
        if lp == 0:
            g["empty"] += 1
        else:
            g["dirs"].setdefault((lp, tuple(parts[:-1])), set()).add(
                frozenset(parts[-1])
            )
        self.n += 1
        node = g["trie"]
        node[1][lp] = node[1].get(lp, 0) + 1
        for seg in parts:
            node = node[0].setdefault(seg, [{}, {}])
            node[1][lp] = node[1].get(lp, 0) + 1

    def is_trap(self, url: str) -> bool:
        key, c = self._parse(url)
        g = self.groups.get(key)
        if g is None:
            return False
        t = self.threshold
        lc = len(c)
        # case A
        if lc == 0:
            if g["empty"] > 0:
                return True  # both paths empty → defined similarity 1.0
        else:
            cset = frozenset(c[-1])
            for s in g["dirs"].get((lc, tuple(c[:-1])), ()):
                union = cset | s
                if not union or len(cset & s) / len(union) >= t:
                    return True
        # case B: walk the trie
        node = g["trie"]
        for k in range(lc + 1):
            child = node[0].get(c[k]) if k < lc else None
            child_h = child[1] if child else {}
            if lc > 0:  # lc == 0 pairs: sim is 0 unless both empty (case A)
                for ls, cnt in node[1].items():
                    if cnt - child_h.get(ls, 0) <= 0:
                        continue  # nothing diverges/terminates exactly here
                    if ls == lc and k in (lc - 1, lc):
                        continue  # same-dir same-length pair → case A handles
                    if ls == 0 or max(lc, ls) == 0:
                        continue
                    if k / max(lc, ls) >= t:
                        return True
            if child is None:
                break
            node = child
        return False

    def __len__(self) -> int:
        return self.n
