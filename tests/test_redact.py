"""Redaction kernels: the stock PII patterns must actually catch PII (the
SQL-gated corpus query can't show this — the synthetic corpus has none),
and the sequential multi-pattern semantics must match nested regexp_replace."""

import pyarrow as pa

from searchengine_ray.functions.redact import (
    DEFAULT_PII_PATTERNS, redact_batch)


def _scrub(texts, patterns=None):
    t = pa.table({"text": texts})
    out = redact_batch(t, "text", patterns or DEFAULT_PII_PATTERNS)
    return out["clean"].to_pylist(), out["n_redacted"].to_pylist()


def test_email_phone_ip_redaction():
    clean, n = _scrub([
        "contact bob.smith+spam@corp-mail.co.uk or alice@x.io today",
        "call +1 (415) 555-0199 now",
        "server at 10.0.255.3 rebooted",
        "nothing sensitive here",
    ])
    assert clean[0] == "contact <EMAIL> or <EMAIL> today" and n[0] == 2
    assert clean[1] == "call <PHONE> now" and n[1] == 1
    assert clean[2] == "server at <IPV4> rebooted" and n[2] == 1
    assert clean[3] == "nothing sensitive here" and n[3] == 0


def test_sequential_pattern_semantics():
    # second pattern runs on the FIRST pattern's output: after the email is
    # masked, the digits-only pattern must not see its local part
    pats = [("email", DEFAULT_PII_PATTERNS[0][1]), ("num", r"\d{4,}")]
    clean, n = _scrub(["id 12345 mail 99999@x.com end"], pats)
    assert clean == ["id <NUM> mail <EMAIL> end"]
    assert n == [2]


def test_null_and_empty_propagation():
    clean, n = _scrub(["", None])
    assert clean == ["", None]
    assert n == [0, None]


def test_multiple_matches_one_row():
    clean, n = _scrub(["a@b.co c@d.io e@f.gg"])
    assert clean == ["<EMAIL> <EMAIL> <EMAIL>"] and n == [3]
