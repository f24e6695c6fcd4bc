"""Deterministic rule-based English lemmatizer.

STAND-IN: the reference lemmatizes every token with NLTK's
``WordNetLemmatizer`` (reference tokenizer.py:4,28,38; helpers.py:32).  NLTK
and its WordNet corpus are not available in this environment, so this module
provides a small, fully deterministic rule-based noun lemmatizer modelled on
WordNet's *morphy* detachment rules for nouns (the reference calls
``lemmatize(token)`` with the default pos='n').  It is pluggable: pass any
``Callable[[str], str]`` as ``lemmatize=`` to the tokenizer to swap in the
real WordNet lemmatizer where available.

WordNet morphy noun detachment rules (public, from the WordNet docs):
    "s"   -> ""        "ses" -> "s"      "xes" -> "x"
    "zes" -> "z"       "ches"-> "ch"     "shes"-> "sh"
    "men" -> "man"     "ies" -> "y"
plus a small irregular-noun exception list.  Unlike full morphy we do not
check candidates against the WordNet lexicon (not shipped); we apply the
longest matching suffix rule.

DOCUMENTED DELTA vs NLTK ``WordNetLemmatizer().lemmatize(token)`` (pinned by
``tests/test_tokenizer.py::test_lemmatizer_wordnet_delta_table``): the
divergence class is exactly the tokens whose suffix-stripped candidate is
NOT a WordNet noun — morphy's lexicon check rejects the candidate and
returns the input; without the lexicon we keep the stripped form.

    token       this module   WordNet     agree?
    cats        cat           cat         yes
    boxes       box           box         yes
    studies     study         study       yes
    glasses     glass         glass       yes
    children    child         child       yes (exception list)
    was         wa            was         NO (lexicon would reject 'wa')
    bus         bu            bus         NO ('bus' is itself a noun)
    analysis    analysi       analysis    NO (lexicon would reject)
    lens        len           lens        NO ('lens' is itself a noun)
    this        thi           this        NO (function word)

The delta only affects s-final tokens that are not plural nouns; for the
reference's downstream use (index terms, tf-idf) both sides remain
self-consistent — the same surface token always maps to the same term.
"""

from __future__ import annotations

# A few high-frequency irregular plurals from WordNet's noun.exc.
_IRREGULAR = {
    "children": "child",
    "feet": "foot",
    "geese": "goose",
    "men": "man",
    "women": "woman",
    "mice": "mouse",
    "teeth": "tooth",
    "people": "people",
    "data": "data",
}

# (suffix, replacement) — longest match first.
_SUFFIX_RULES = (
    ("ches", "ch"),
    ("shes", "sh"),
    ("ses", "s"),
    ("xes", "x"),
    ("zes", "z"),
    ("ies", "y"),
    ("men", "man"),
    ("s", ""),
)


def lemmatize(token: str) -> str:
    """Best-effort noun lemma; identity for non-plural-looking tokens."""
    if len(token) <= 2:
        return token
    irr = _IRREGULAR.get(token)
    if irr is not None:
        return irr
    if not token.endswith(("s", "n")):
        return token
    for suffix, repl in _SUFFIX_RULES:
        if token.endswith(suffix):
            stem = token[: len(token) - len(suffix)] + repl
            # guard degenerate stems ("is"->"i", "ss"->"s", "was"->"wa" is
            # accepted — morphy without a lexicon has the same behavior)
            if len(stem) >= 2 and not token.endswith("ss"):
                return stem
            return token
    return token


def identity(token: str) -> str:
    return token
