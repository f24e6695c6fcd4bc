"""URL-similarity golden values from reference link_similarity.py:179-222."""

import math

from searchengine_ray.functions.linksim import (
    URL_SIMILARITY_THRESHOLD,
    link_similarity,
    should_evaluate_against_seen,
    should_evaluate_url,
)


def isclose(a, b):
    # reference local_isclose: rel_tol=.01 (link_similarity.py:166,175-176)
    return math.isclose(a, b, rel_tol=0.01)


U_BLOG = "https://blogboard.io/blog/knowledge/python-print-to-stderr/"
U_BLOG_PARENT = "https://blogboard.io/blog/knowledge/"
U_YT = "https://www.youtube.com/results?search_query=reform+part+1"
U_EPIC1 = "https://sphinx.epic.com/hsch/"
U_EPIC2 = "https://epic.com/hsch"
U_TRAP1 = "https://wics.ics.uci.edu/events/category/wics-bonding/day/2013-08-22/"
U_TRAP2 = "https://wics.ics.uci.edu/events/category/wics-bonding/day/2013-08-23/"


def test_golden_identical():
    assert isclose(link_similarity(U_BLOG, U_BLOG), 1.0)


def test_golden_parent_path():
    assert isclose(link_similarity(U_BLOG, U_BLOG_PARENT), 0.66)


def test_golden_cross_host():
    assert isclose(link_similarity(U_BLOG, U_YT), 0.0)
    assert isclose(link_similarity(U_EPIC1, U_EPIC2), 0.0)


def test_golden_date_trap():
    assert isclose(link_similarity(U_TRAP1, U_TRAP2), 1.0)


def test_should_evaluate_golden():
    # reference link_similarity.py:209-222
    assert should_evaluate_url(U_BLOG, U_BLOG_PARENT) is True
    assert (
        should_evaluate_url(
            "https://stackoverflow.com/questions/16712795/pass-arguments-from-cmd-to-python-script",
            "https://stackoverflow.com/questions/16712795",
        )
        is True
    )
    assert should_evaluate_url(U_TRAP1, U_TRAP2) is False


def test_against_seen_set():
    seen = [U_TRAP1, U_BLOG]
    assert should_evaluate_against_seen(seen, U_YT) is True
    assert should_evaluate_against_seen(seen, U_TRAP2) is False


def test_empty_paths_defined():
    assert link_similarity("https://a.com", "https://a.com") == 1.0
    assert link_similarity("https://a.com", "https://a.com/x") == 0.0


def test_threshold_value():
    assert URL_SIMILARITY_THRESHOLD == 0.85


def _random_urls(rng, n):
    """URL generator biased toward trap-index edge cases: shared directories,
    near-identical last segments, prefix chains, varying depths, empty
    paths, scheme/port variants."""
    hosts = ["a.test", "b.test:8080", "a.test"]
    schemes = ["https", "http"]
    segs = ["a", "b", "day", "2013-08-2", "2013-08-3", "x1", "x2", "long-segment"]
    urls = []
    for _ in range(n):
        scheme = schemes[rng.randint(0, 2)]
        host = hosts[rng.randint(0, 3)]
        depth = rng.randint(0, 14)
        parts = [segs[rng.randint(0, len(segs))] for _ in range(depth)]
        urls.append(f"{scheme}://{host}/" + "/".join(parts))
    return urls


def test_trap_index_matches_bruteforce():
    """TrapIndex must be EXACTLY equivalent to the reference's all-pairs
    scan (link_similarity.py:225-230) for every probe, on adversarial URL
    sets."""
    import numpy as np

    from searchengine_ray.functions.linksim import TrapIndex

    rng = np.random.RandomState(1234)
    for trial in range(8):
        urls = _random_urls(rng, 60)
        idx = TrapIndex(0.85)
        seen: list[str] = []
        for u in urls:
            want = not should_evaluate_against_seen(seen, u)
            got = idx.is_trap(u)
            assert got == want, (trial, u, seen)
            # admit exactly when the brute-force gate admits
            if not want:
                idx.add(u)
                seen.append(u)


def test_trap_index_golden_cases():
    from searchengine_ray.functions.linksim import TrapIndex

    idx = TrapIndex(0.85)
    idx.add(U_TRAP1)
    assert idx.is_trap(U_TRAP2)  # date family
    assert idx.is_trap(U_TRAP1)  # identical
    assert not idx.is_trap(U_BLOG)  # other host
    idx.add(U_BLOG)
    assert not idx.is_trap(U_BLOG_PARENT)  # 0.66 < 0.85
    # empty-path identity
    idx2 = TrapIndex(0.85)
    idx2.add("https://a.com")
    assert idx2.is_trap("https://a.com")
    assert not idx2.is_trap("https://a.com/x")
    # deep prefix-ratio case (B): 12-deep chain vs 13-deep extension
    base = "https://d.test/" + "/".join(f"s{i}" for i in range(12))
    idx3 = TrapIndex(0.85)
    idx3.add(base)
    assert idx3.is_trap(base + "/tail")  # 12/13 ≈ 0.923 ≥ 0.85
    assert not idx3.is_trap("https://d.test/" + "/".join(f"s{i}" for i in range(6)))
