"""Per-source boilerplate detection + removal (the RefinedWeb/CCNet web
cleaning move the reference's per-page pipeline has no corpus-wide analog
for): a LINE that appears in at least half of a source's documents is
site furniture (nav bars, cookie banners, footers), not content — detect
the set once over the corpus, then strip those lines from every document
of that source.

Segmentation: documents here are single-space token streams with no
newlines, so a "line" is a fixed window of ``LINE_TOKENS`` consecutive
tokens starting at token 0 (deterministic, SQL-reproducible — DuckDB
mirrors it with list slicing).  Real crawl text would split on newlines
instead; the distributed shape is identical.

Scale shape (10^10 docs):
- pass 1 is map-only per batch (tokenize + vectorized line hashing), then
  ONE ``pre_aggregate`` by (source, line_hash) — the only all-to-all; the
  per-(source,line) distinct-doc counts shrink map-side first.
- the boilerplate SET is provably small: a line needs df ≥ D_s/2, so a
  source with L_s total line occurrences has ≤ 2·L_s/D_s ≈ 2·lines/doc
  qualifying lines — O(sources) · O(lines/doc) rows total.  It is pulled
  to the driver and broadcast (``ray.put``) once; documents never shuffle.
- pass 2 is map-only: recompute each doc's line hashes, one ``np.isin``
  against the broadcast key array, per-doc aggregates via ``bincount``.

Line identity is an int64 wraparound polynomial over per-token
``hash_pandas_object`` hashes (``categorize=False`` — NUL-safe per-frame
determinism, see CLAUDE.md) with the line's token count mixed in so a
short tail line can't collide with a zero-padded full line.  Both passes
share the one kernel, so identity is consistent by construction.
"""

from __future__ import annotations

from itertools import chain

import numpy as np
import pandas as pd

LINE_TOKENS = 8
_MUL = np.int64(1000003)  # wraparound polynomial combine (int64 bits)


def line_table_batch(df: pd.DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     src_col: str = "source") -> pd.DataFrame:
    """One batch of docs → one row per LINE: ``(doc_id, source, line_id,
    line_hash, line_chars)``.  ``line_chars`` = len(line string) including
    its intra-line single spaces, so a downstream "join kept lines with
    ' '" length is pure integer arithmetic.  Vectorized after the per-doc
    ``str.split`` (the cost floor shared with every text stage)."""
    texts = ["" if t is None else t for t in df[text_col]]
    tok_lists = [t.split(" ") for t in texts]
    lens = np.fromiter((len(x) for x in tok_lists), np.int64,
                       count=len(tok_lists))
    flat = list(chain.from_iterable(tok_lists))
    if not flat:
        return pd.DataFrame({
            "doc_id": np.array([], np.int64),
            "source": pd.Series([], dtype=object),
            "line_id": np.array([], np.int64),
            "line_hash": np.array([], np.int64),
            "line_chars": np.array([], np.int64)})
    th = pd.util.hash_pandas_object(
        pd.Series(flat), index=False,
        categorize=False).to_numpy().view(np.int64)
    tlen = np.fromiter((len(s) for s in flat), np.int64, count=len(flat))
    starts = np.zeros(len(lens), np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    pos = np.arange(lens.sum(), dtype=np.int64) - np.repeat(starts, lens)
    line_id = pos // LINE_TOKENS
    slot = pos % LINE_TOKENS
    n_lines = (lens + LINE_TOKENS - 1) // LINE_TOKENS
    line_starts = np.zeros(len(n_lines), np.int64)
    np.cumsum(n_lines[:-1], out=line_starts[1:])
    gline = np.repeat(line_starts, lens) + line_id
    total = int(n_lines.sum())
    slots = np.zeros((total, LINE_TOKENS), np.int64)
    slots[gline, slot] = th
    ntok = np.bincount(gline, minlength=total).astype(np.int64)
    chars = (np.bincount(gline, weights=tlen, minlength=total)
             .astype(np.int64) + ntok - 1)
    h = np.zeros(total, np.int64)
    for j in range(LINE_TOKENS):  # wraparound polynomial, int64 bits
        h = h * _MUL + slots[:, j]
    h = h * _MUL + ntok  # tail lines can't alias padded full lines
    doc_of_line = np.repeat(np.arange(len(lens), dtype=np.int64), n_lines)
    within = np.arange(total, dtype=np.int64) - np.repeat(line_starts,
                                                          n_lines)
    return pd.DataFrame({
        "doc_id": df[id_col].to_numpy()[doc_of_line].astype(np.int64),
        "source": df[src_col].to_numpy()[doc_of_line],
        "line_id": within,
        "line_hash": h,
        "line_chars": chars})


def _key(src_series, line_hash: np.ndarray) -> np.ndarray:
    """(source, line_hash) → one int64 key for flat set membership."""
    sh = pd.util.hash_pandas_object(
        pd.Series(np.asarray(src_series, dtype=object)), index=False,
        categorize=False).to_numpy().view(np.int64)
    return sh * _MUL + line_hash


def detect_boilerplate(ds, text_col: str = "text", id_col: str = "doc_id",
                       src_col: str = "source",
                       batch_size: int = 512) -> np.ndarray:
    """Corpus pass: the (source, line_hash) keys whose line appears in
    ≥ half of its source's docs (and in ≥ 2 docs — a single-doc source
    must not declare itself boilerplate).  Returns the sorted int64 key
    array (small — see module docstring bound) for broadcast."""
    from searchengine_ray.stages.relational import pre_aggregate

    def lines(df: pd.DataFrame) -> pd.DataFrame:
        lt = line_table_batch(df, text_col, id_col, src_col)
        # distinct docs per line: a line repeated WITHIN a doc counts once
        lt = lt.drop_duplicates(["source", "line_hash", "doc_id"])
        return lt[["source", "line_hash"]]

    freq = pre_aggregate(
        ds.map_batches(lines, batch_format="pandas", batch_size=batch_size),
        ["source", "line_hash"], {"df": (None, "count")})
    totals = pre_aggregate(ds.select_columns([src_col]), [src_col],
                           {"n_docs": (None, "count")}).to_pandas()
    d_by_src = dict(zip(totals[src_col], totals["n_docs"].astype(np.int64)))

    def keep_boiler(df: pd.DataFrame) -> pd.DataFrame:
        d = df["source"].map(d_by_src).to_numpy(np.int64)
        dfreq = df["df"].to_numpy(np.int64)
        m = (2 * dfreq >= d) & (dfreq >= 2)
        return df[m]

    # boiler rows are the ≤ 2·lines/doc per source survivors — tiny
    boiler = freq.map_batches(keep_boiler,
                              batch_format="pandas").to_pandas()
    if boiler.empty:  # empty Datasets drop the schema through to_pandas
        return np.array([], dtype=np.int64)
    return np.sort(_key(boiler["source"], boiler["line_hash"].to_numpy()))


def remove_boilerplate(ds, boiler_keys_ref, text_col: str = "text",
                       id_col: str = "doc_id", src_col: str = "source",
                       batch_size: int = 512):
    """Map-only strip pass: per doc, drop every line whose (source,
    line_hash) is in the broadcast boilerplate set; emit ``(doc_id,
    n_lines, n_kept, clean_n_chars)`` where ``clean_n_chars`` is the
    length of the kept lines joined by ' ' (0 when nothing survives).
    ``boiler_keys_ref`` is a ``ray.ObjectRef`` to the sorted key array
    (``ray.put`` once — zero-copy per worker), or the array itself."""
    import ray

    def strip(df: pd.DataFrame) -> pd.DataFrame:
        keys = boiler_keys_ref
        if isinstance(keys, ray.ObjectRef):  # pragma: no cover - type gate
            keys = ray.get(keys)
        lt = line_table_batch(df, text_col, id_col, src_col)
        k = _key(lt["source"], lt["line_hash"].to_numpy())
        is_boiler = np.zeros(len(lt), dtype=bool)
        if len(keys) and len(lt):
            idx = np.searchsorted(keys, k)
            idx[idx == len(keys)] = 0
            is_boiler = keys[idx] == k
        # per-doc aggregates: docs never span batches (lines derive from
        # the doc's own row), so one bincount per batch is exact
        docs = df[id_col].to_numpy().astype(np.int64)
        inv, di = np.unique(lt["doc_id"].to_numpy(np.int64),
                            return_inverse=True)
        n = len(inv)
        n_lines = np.bincount(di, minlength=n)
        kept = ~is_boiler
        n_kept = np.bincount(di[kept], minlength=n)
        chars = np.bincount(di[kept],
                            weights=lt["line_chars"].to_numpy()[kept],
                            minlength=n).astype(np.int64)
        clean = np.where(n_kept > 0, chars + n_kept - 1, 0)
        out = pd.DataFrame({"doc_id": inv.astype(np.int64),
                            "n_lines": n_lines.astype(np.int64),
                            "n_kept": n_kept.astype(np.int64),
                            "clean_n_chars": clean.astype(np.int64)})
        # docs whose text is empty still produce one line ('' splits to
        # ['']), so every input doc appears; assert the invariant cheaply
        assert len(out) == len(np.unique(docs))
        return out

    return ds.map_batches(strip, batch_format="pandas",
                          batch_size=batch_size)
