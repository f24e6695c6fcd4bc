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


def test_term_weights_additive():
    # reference helpers.py:44-45: += multiplier per tag occurrence
    text = extract_text(PAGE)
    tf = term_frequencies(tokenize_fast(text, identity))
    tw = calculate_term_weights(extract_tag_texts(PAGE), tf, identity)
    assert math.isclose(tw["big"], HTML_WEIGHT_MULTIPLIER["h1"])  # 2
    assert math.isclose(tw["bold"], HTML_WEIGHT_MULTIPLIER["b"])  # 1.25
    assert math.isclose(tw["link"], HTML_WEIGHT_MULTIPLIER["a"])  # 1.05
    assert "paragraph" not in tw  # only weighted-tag words get weights
