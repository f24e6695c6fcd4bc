"""Tokenizer semantics vs reference tokenizer.py:6,9-44 and
helpers.py:21-27 (term frequencies)."""

import math

from searchengine_ray.functions.lemmatizer import identity
from searchengine_ray.functions.tokenizer import (
    MAX_TOKEN_LENGTH,
    term_frequencies,
    tokenize,
    tokenize_fast,
)


def test_basic_tokens_lower_and_split():
    assert tokenize("Hello, World!", identity) == ["hello", "world"]


def test_apostrophe_kept_inside_stripped_at_edges():
    # strip(" '") at tokenizer.py:27
    assert tokenize("don't 'quoted'", identity) == ["don't", "quoted"]


def test_non_ascii_is_delimiter():
    # char must be ascii AND alnum (tokenizer.py:17)
    assert tokenize("café ole", identity) == ["caf", "ole"]
    assert tokenize("你好abc", identity) == ["abc"]


def test_digits_kept():
    assert tokenize("abc123 42", identity) == ["abc123", "42"]


def test_long_token_dropped_entirely():
    # tokens exceeding MAX_TOKEN_LENGTH discarded, not truncated
    long_tok = "a" * (MAX_TOKEN_LENGTH + 1)
    assert tokenize(f"x {long_tok} y", identity) == ["x", "y"]
    exact = "b" * MAX_TOKEN_LENGTH
    assert tokenize(f"x {exact} y", identity) == ["x", exact, "y"]


def test_apostrophe_only_run_emits_empty_string():
    # reference quirk preserved: strip before append, no emptiness check
    assert tokenize("'' word", identity) == ["", "word"]


def test_fast_matches_scan():
    cases = [
        "Hello, World! don't 'q' café 123  a''b",
        "x " + "a" * (MAX_TOKEN_LENGTH + 1) + " y",
        "",
        "'''",
        "tab\tsep\nlines",
    ]
    for text in cases:
        assert tokenize_fast(text, identity) == tokenize(text, identity), text


def test_lemmatize_applied():
    assert tokenize("cats running children", ) == ["cat", "running", "child"]


def test_term_frequencies():
    tf = term_frequencies(["a", "b", "a", "c"])
    assert math.isclose(tf["a"], 0.5)
    assert math.isclose(tf["b"], 0.25)
    assert math.isclose(tf["c"], 0.25)
    assert term_frequencies([]) == {}


def test_lemmatizer_wordnet_delta_table():
    """Golden table pinning the stand-in lemmatizer AND its documented
    divergence from NLTK's WordNetLemmatizer (functions/lemmatizer.py
    docstring): rows marked agree=False are exactly the cases where morphy's
    lexicon check would have rejected the stripped candidate."""
    from searchengine_ray.functions.lemmatizer import lemmatize

    table = [
        # (token, this_module, wordnet, agree)
        ("cats", "cat", "cat", True),
        ("boxes", "box", "box", True),
        ("studies", "study", "study", True),
        ("glasses", "glass", "glass", True),
        ("churches", "church", "church", True),
        ("wishes", "wish", "wish", True),
        ("children", "child", "child", True),
        ("men", "man", "man", True),
        ("data", "data", "data", True),
        ("was", "wa", "was", False),
        ("bus", "bu", "bus", False),
        ("analysis", "analysi", "analysis", False),
        ("lens", "len", "lens", False),
        ("this", "thi", "this", False),
    ]
    for token, ours, wordnet, agree in table:
        assert lemmatize(token) == ours, token
        assert (ours == wordnet) == agree, token
