"""Vectorized regex redaction — the PII-scrub / entity-mask stage of a
training-data pipeline (reference has no analog; §"beyond the reference").

Everything runs through Arrow's RE2 kernels (`replace_substring_regex`,
`count_substring_regex`) on zero-copy pyarrow batches — no Python loop ever
touches a row, so the stage is a pure map over the corpus (the only shape
that matters at 100 TB: no shuffle, no state, embarrassingly parallel).
DuckDB's `regexp_replace(..., 'g')` / `regexp_extract_all` are RE2 too, so
the operator is SQL-oracle-checkable with the SAME pattern strings.

Patterns apply in list order, each to the OUTPUT of the previous one
(mirrors nested `regexp_replace` in SQL); per-row match counts are taken on
the text state each pattern actually saw.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

# The stock PII set (pinned by tests/test_redact.py on crafted strings; the
# synthetic word-salad corpus contains none of these, so the SQL-gated query
# uses a corpus-relevant entity pattern instead — same machinery).
DEFAULT_PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"),
    # ipv4 must precede phone (both are digit runs; phone excludes '.' so it
    # can never eat a dotted quad or a decimal, but order still matters for
    # adjacent text) and email must precede both (digits in local parts)
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
    ("phone", r"\+?\d[\d\-\s()]{6,}\d"),
]


def redact_batch(
    batch: pa.Table, text_col: str,
    patterns: list[tuple[str, str]],
    out_col: str = "clean", count_col: str = "n_redacted",
) -> pa.Table:
    """One Arrow kernel call per pattern over the whole batch: count the
    non-overlapping matches, then replace every one with ``<NAME>``."""
    text = batch[text_col]
    total = None
    for name, pat in patterns:
        n = pc.count_substring_regex(text, pattern=pat)
        total = n if total is None else pc.add(total, n)
        text = pc.replace_substring_regex(
            text, pattern=pat, replacement=f"<{name.upper()}>")
    if total is None:
        total = pa.array([0] * len(batch), type=pa.int64())
    batch = batch.append_column(out_col, text)
    return batch.append_column(count_col, pc.cast(total, pa.int64()))


def redact(
    ds: Dataset, text_col: str = "text",
    patterns: list[tuple[str, str]] | None = None,
    out_col: str = "clean", count_col: str = "n_redacted",
) -> Dataset:
    """Map-only redaction stage (stateless closure — per the actor-respawn
    gotcha, no callable class needed: the compiled-pattern state lives in
    Arrow's kernel, not per-worker Python)."""
    pats = DEFAULT_PII_PATTERNS if patterns is None else patterns

    def fn(batch: pa.Table) -> pa.Table:
        return redact_batch(batch, text_col, pats, out_col, count_col)

    return ds.map_batches(fn, batch_format="pyarrow")
