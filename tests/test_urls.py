"""URL canonicalize / hash / validity (reference utils/__init__.py:25-35,
README.md:113-114,209-213)."""

from searchengine_ray.utils.urls import (
    get_urlhash,
    is_valid,
    join_url,
    normalize,
    parse_url,
    urldefrag_str,
)


def test_normalize_strips_one_trailing_slash():
    assert normalize("https://a.com/x/") == "https://a.com/x"
    assert normalize("https://a.com/x") == "https://a.com/x"
    # rstrip in the reference strips ALL trailing slashes once triggered
    assert normalize("https://a.com/x//") == "https://a.com/x"


def test_urlhash_excludes_scheme():
    # reference utils/__init__.py:27 comment: "everything other than scheme"
    assert get_urlhash("http://a.com/p?q=1") == get_urlhash("https://a.com/p?q=1")
    assert get_urlhash("https://a.com/p") != get_urlhash("https://a.com/q")


def test_urlhash_is_sha256_of_field_join():
    from hashlib import sha256

    url = "https://host.edu/path;par?q=2#frag"
    expect = sha256("host.edu//path/par/q=2/frag".encode()).hexdigest()
    assert get_urlhash(url) == expect


def test_parse_url_fields():
    d = parse_url("https://host.edu:8080/path;par?q=2#frag")
    assert d["scheme"] == "https"
    assert d["netloc"] == "host.edu:8080"
    assert d["hostname"] == "host.edu"
    assert d["port"] == 8080
    assert d["path"] == "/path"
    assert d["params"] == "par"
    assert d["query"] == "q=2"
    assert d["fragment"] == "frag"


def test_defrag():
    assert urldefrag_str("https://a.com/x#sec") == "https://a.com/x"


def test_join_url():
    assert join_url("https://a.com/dir/page", "/other") == "https://a.com/other"
    assert join_url("https://a.com/dir/page", "sub") == "https://a.com/dir/sub"


def test_is_valid_scheme_and_extension():
    assert is_valid("https://a.edu/page.html")
    assert not is_valid("ftp://a.edu/page")
    assert not is_valid("mailto:x@y.z")
    for ext in ("pdf", "ppt", "css", "js", "zip", "jpg", "mp4"):
        assert not is_valid(f"https://a.edu/file.{ext}"), ext
    # extension check is on the path, not the query
    assert is_valid("https://a.edu/page?file=x.pdf")


def test_is_valid_domain_restriction():
    domains = ("ics.uci.edu",)
    assert is_valid("https://www.ics.uci.edu/x", domains)
    assert is_valid("https://ics.uci.edu/x", domains)
    assert not is_valid("https://uci.edu/x", domains)
    assert not is_valid("https://evilics.uci.edu.com/x", domains)
