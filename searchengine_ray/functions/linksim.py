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
