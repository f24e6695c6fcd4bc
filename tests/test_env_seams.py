"""Seam-warm tests: skipped while the optional packages are absent, they
ACTIVATE automatically if a future environment gains lance / bs4 / nltk —
flipping fidelity checks on without a round of rework.

Each test exercises the existing seam (sources/storage.py HAVE_LANCE,
functions/html.py regex scanner, functions/lemmatizer.py rule table)
against the real package so an upgrade is verified, not assumed.
"""

import numpy as np
import pyarrow as pa
import pytest


def test_lance_roundtrip_through_storage_seam(tmp_path):
    pytest.importorskip("lance", reason="lance absent — parquet fallback "
                        "covered by the checkpoint/resume suite")
    from searchengine_ray.sources import storage

    assert storage.HAVE_LANCE
    t = pa.table({"image_id": pa.array(["a", "b"], pa.string()),
                  "phash": pa.array([1, 2], pa.int64())})
    uri = storage.write_table_atomic(t, str(tmp_path / "tbl"))
    assert uri.endswith(".lance")
    back = storage.read_table(str(tmp_path / "tbl"))
    assert back.equals(t)


def test_bs4_text_extraction_parity():
    pytest.importorskip("bs4", reason="bs4 absent — regex scanner deltas "
                        "are golden-tested in tests/test_html.py")
    lxml = pytest.importorskip("lxml", reason="lxml absent")  # noqa: F841
    from bs4 import BeautifulSoup

    from searchengine_ray.functions.html import extract_text

    # On well-formed HTML (no unclosed script/style, the documented delta
    # cases) the regex scanner must agree with the reference's
    # BeautifulSoup(content, 'lxml') token stream.
    html = ("<html><head><title>T</title><script>var x=1;</script></head>"
            "<body><h1>Head</h1><p>one &amp; two</p><b>bold</b></body></html>")
    ours = " ".join(extract_text(html).split())
    ref = " ".join(BeautifulSoup(html, "lxml").get_text(" ").split())
    assert ours == ref


def test_wordnet_lemmatizer_parity_on_regular_forms():
    nltk = pytest.importorskip("nltk", reason="nltk absent — rule-based "
                               "stand-in delta table is golden-tested")
    try:
        from nltk.stem import WordNetLemmatizer

        wn = WordNetLemmatizer()
        wn.lemmatize("cats")  # raises LookupError if corpus data missing
    except LookupError:
        pytest.skip("nltk present but wordnet corpus not downloaded")
    from searchengine_ray.functions.lemmatizer import lemmatize

    # Regular plural/verb forms where the rule table claims wordnet parity
    for w in ["cats", "dogs", "boxes", "churches", "running", "walked"]:
        assert lemmatize(w) == wn.lemmatize(wn.lemmatize(w), "v") or \
            lemmatize(w) == wn.lemmatize(w)
