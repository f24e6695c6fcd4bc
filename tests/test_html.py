"""HTML text/tag extraction (M1/M4 kernels, reference
index_construction.py:125-127 + helpers.py:31-47)."""

import math

from searchengine_ray.functions.html import extract_tag_texts, extract_text
from searchengine_ray.functions.lemmatizer import identity
from searchengine_ray.functions.tokenizer import (
    HTML_WEIGHT_MULTIPLIER,
    calculate_term_weights,
    term_frequencies,
    tokenize_fast,
)

PAGE = """
<html><head><title>Search Engines</title>
<style>body { color: red }</style>
<script>var x = "ignored words";</script></head>
<body><h1>Big Header</h1>
<p>Plain paragraph with &amp; entity and <b>bold term</b>.</p>
<a href="/x">link text</a><!-- comment gone -->
</body></html>
"""


def test_extract_text_strips_markup_scripts_entities():
    text = extract_text(PAGE)
    assert "search engines" in text
    assert "plain paragraph with & entity" in text
    assert "ignored" not in text  # script dropped
    assert "color" not in text  # style dropped
    assert "comment" not in text
    assert "<" not in text and ">" not in text
    assert text == text.lower()


def test_extract_tag_texts():
    tags = dict(extract_tag_texts(PAGE))
    assert tags["title"] == "Search Engines"
    assert tags["h1"] == "Big Header"
    assert tags["b"] == "bold term"
    assert tags["a"] == "link text"


def test_adversarial_quoted_attr_gt():
    """A '>' inside a quoted attribute must not split the tag (the intended
    get_text(' ') behavior: the whole tag strips as one unit)."""
    t = extract_text('before <img alt="a>b" src=\'c>d\'> after')
    assert t == "before after"


def test_adversarial_unclosed_tags():
    t = extract_text("<p>open para <b>bold runs to <i>end")
    assert t == "open para bold runs to end"


def test_adversarial_entities():
    t = extract_text("A&#65;&amp;&lt;b&gt;&quot;x&quot;")
    # numeric ref, ampersand, and &lt;b&gt; as LITERAL text (same as
    # get_text — entity-encoded markup is text, not markup)
    assert t == 'aa&<b>"x"'


def test_adversarial_uppercase_and_spacing():
    t = extract_text("<DIV CLASS='x'>Mixed <B>Case</B></DIV><p >spaced</p  >")
    assert t == "mixed case spaced"


def test_adversarial_script_with_markup_inside():
    # markup-looking JS strings stay dropped with the script block
    t = extract_text('<script>var s = "<b>not text</b>";</script>visible')
    assert t == "visible"


def test_adversarial_script_end_in_string_delta():
    """Pinned DELTA (module docstring): '</script>' inside a JS string ends
    the block — the tail of the string leaks as text (lxml does the same;
    neither side implements the HTML5 script tokenizer)."""
    t = extract_text('<script>var s = "</script>";</script>tail')
    assert "tail" in t


def test_adversarial_unclosed_style_delta():
    """Pinned DELTA: an unclosed <style> block is NOT dropped by the regex
    scanner (lxml would drop to end-of-document) — the rule here is that
    malformed-block content degrades to visible text, never to an error."""
    t = extract_text("<style>body { color: red } no close tag")
    assert "color" in t  # degraded to text, documented divergence


def test_adversarial_nested_weighted_tags():
    tags = dict(extract_tag_texts("<h1>Top <b>inner</b> tail</h1>"))
    assert tags["h1"] == "Top inner tail"
    assert tags["b"] == "inner"


def test_adversarial_empty_and_plain():
    assert extract_text("") == ""
    assert extract_text("no markup at all") == "no markup at all"
    assert extract_tag_texts("no markup") == []


def test_term_weights_additive():
    # reference helpers.py:44-45: += multiplier per tag occurrence
    text = extract_text(PAGE)
    tf = term_frequencies(tokenize_fast(text, identity))
    tw = calculate_term_weights(extract_tag_texts(PAGE), tf, identity)
    assert math.isclose(tw["big"], HTML_WEIGHT_MULTIPLIER["h1"])  # 2
    assert math.isclose(tw["bold"], HTML_WEIGHT_MULTIPLIER["b"])  # 1.25
    assert math.isclose(tw["link"], HTML_WEIGHT_MULTIPLIER["a"])  # 1.05
    assert "paragraph" not in tw  # only weighted-tag words get weights
