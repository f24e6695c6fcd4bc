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
