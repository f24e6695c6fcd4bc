"""Minimal HTML text extraction — the M1/M4 kernels without a parser dep.

The reference uses BeautifulSoup+lxml (`index_construction.py:125-127`,
`helpers.py:35`): ``get_text(separator=' ').lower()`` for the token stream
and per-tag text for the term-weight table (`helpers.py:31-47`).  Neither
bs4 nor lxml ships in this environment, so this module implements the two
operations with a small regex scanner:

- ``extract_text``: drop <script>/<style> subtrees, strip tags, unescape
  entities, join with spaces, lowercase — the M1 analog;
- ``extract_tag_texts``: (tag_name, inner_text) pairs for the tags in
  ``HTML_WEIGHT_MULTIPLIER`` (title/h1/h2/h3/b/strong/a/i/em/h5/h6) — the
  input to ``calculate_term_weights``.

Documented deltas vs ``BeautifulSoup(content, 'lxml').get_text(' ')``
(pinned by the adversarial goldens in tests/test_html.py):

- an UNCLOSED <script>/<style> runs to end-of-document in lxml (content
  after it is dropped); the regex scanner only drops properly closed
  blocks, so trailing content survives here;
- ``</script>`` INSIDE a JS string literal ends the script block in both
  (neither implements the HTML5 script tokenizer);
- entity references are unescaped AFTER tag stripping, so ``&lt;b&gt;``
  yields literal ``<b>`` as text — same as get_text;
- lxml repairs some malformed nestings (e.g. p inside b) that the scanner
  treats as plain text boundaries; token STREAMS still agree because both
  sides reduce to whitespace-joined text.

Not a general HTML5 parser — swap in bs4 where available, the downstream
stages only see text.
"""

from __future__ import annotations

import html as _html
import re

_SCRIPT_RE = re.compile(r"<(script|style)\b.*?</\1\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
# quoted attribute values may contain '>' — consume them as units so
# <img alt="a>b"> strips as ONE tag (matching what a real parser does)
_TAG_RE = re.compile(r"""<(?:[^>"']|"[^"]*"|'[^']*')*>""")
_WS_RE = re.compile(r"\s+")

_WEIGHTED_TAGS = ("title", "h1", "h2", "h3", "b", "strong", "a", "i", "em", "h5", "h6")
_TAG_TEXT_RES = {
    t: re.compile(rf"<{t}\b[^>]*>(.*?)</{t}\s*>", re.IGNORECASE | re.DOTALL)
    for t in _WEIGHTED_TAGS
}


def extract_text(html_content: str) -> str:
    """HTML → lowercase text with single-space separators (M1,
    reference index_construction.py:125-127)."""
    s = _COMMENT_RE.sub(" ", html_content)
    s = _SCRIPT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    return _WS_RE.sub(" ", s).strip().lower()


def extract_tag_texts(html_content: str) -> list[tuple[str, str]]:
    """(tag, inner_text) pairs for the weight-multiplier tags (M4 input,
    reference helpers.py:35-45).  Inner markup is stripped."""
    s = _COMMENT_RE.sub(" ", html_content)
    s = _SCRIPT_RE.sub(" ", s)
    out: list[tuple[str, str]] = []
    for tag in _WEIGHTED_TAGS:
        for m in _TAG_TEXT_RES[tag].finditer(s):
            inner = _WS_RE.sub(" ", _html.unescape(_TAG_RE.sub(" ", m.group(1)))).strip()
            if inner:
                out.append((tag, inner))
    return out
