"""Boilerplate detection/removal: kernel vs naive reference, planted
end-to-end detection, and strip-output equivalence to brute force."""

import numpy as np
import pandas as pd
import pytest

from searchengine_ray.stages.boilerplate import (LINE_TOKENS,
                                                 line_table_batch)


def naive_lines(text: str) -> list[str]:
    toks = text.split(" ")
    return [" ".join(toks[i:i + LINE_TOKENS])
            for i in range(0, len(toks), LINE_TOKENS)]


DOCS = pd.DataFrame({
    "doc_id": [1, 2, 3, 4],
    "source": ["a", "a", "b", "b"],
    "text": [
        "w1 w2 w3 w4 w5 w6 w7 w8 tail1 tail2",       # full line + 2-token tail
        "w1 w2 w3 w4 w5 w6 w7 w8",                   # exactly one line
        "x1 x2 x3",                                  # single short line
        "",                                          # empty text → [''] → 1 line
    ],
})


def test_line_table_matches_naive_reference():
    lt = line_table_batch(DOCS)
    for did, text in zip(DOCS.doc_id, DOCS.text):
        want = naive_lines(text)
        got = lt[lt.doc_id == did].sort_values("line_id")
        assert len(got) == len(want)
        assert got["line_id"].tolist() == list(range(len(want)))
        assert got["line_chars"].tolist() == [len(s) for s in want]


def test_line_hash_equal_strings_equal_hashes_and_no_pad_alias():
    # doc 1's first line and doc 2's only line are the same string →
    # same hash; the 2-token tail must NOT alias a zero-padded full line
    lt = line_table_batch(DOCS)
    h1 = lt[(lt.doc_id == 1) & (lt.line_id == 0)].line_hash.iloc[0]
    h2 = lt[(lt.doc_id == 2)].line_hash.iloc[0]
    assert h1 == h2
    all_lines = {}
    for did, text in zip(DOCS.doc_id, DOCS.text):
        for i, s in enumerate(naive_lines(text)):
            h = lt[(lt.doc_id == did) & (lt.line_id == i)].line_hash.iloc[0]
            if s in all_lines:
                assert all_lines[s] == h, s
            else:
                for s2, h2b in all_lines.items():
                    assert not (s2 != s and h2b == h), (s, s2)
                all_lines[s] = h
    # explicit pad-alias probe: "t 0-hash-like" short line vs longer line
    probe = pd.DataFrame({
        "doc_id": [10, 11], "source": ["p", "p"],
        "text": ["alpha beta", "alpha beta gamma"]})
    pt = line_table_batch(probe)
    assert pt.line_hash.nunique() == 2


def _planted_corpus() -> pd.DataFrame:
    rows = []
    did = 0
    for src in ("s1", "s2"):
        header = f"{src} home nav about contact search login help"
        promo = f"{src} promo banner subscribe newsletter deal offer click"
        rare = f"{src} rare notice special announce once seldom never"
        for k in range(10):
            parts = [header]
            if k < 6:
                parts.append(promo)
            if k >= 8:
                parts.append(rare)
            body = " ".join(f"body{did}tok{j}" for j in range(11))
            parts.append(body)
            rows.append({"doc_id": did, "source": src,
                         "text": " ".join(parts)})
            did += 1
    return pd.DataFrame(rows)


def _naive_expected(df: pd.DataFrame):
    lines = []
    for row in df.itertuples():
        for i, s in enumerate(naive_lines(row.text)):
            lines.append((row.source, s, row.doc_id, i))
    ldf = pd.DataFrame(lines, columns=["source", "line", "doc_id", "i"])
    d = df.groupby("source").size()
    freq = (ldf.drop_duplicates(["source", "line", "doc_id"])
            .groupby(["source", "line"]).size())
    boiler = {(s, l) for (s, l), c in freq.items()
              if 2 * c >= d[s] and c >= 2}
    out = []
    for row in df.itertuples():
        ls = naive_lines(row.text)
        kept = [s for s in ls if (row.source, s) not in boiler]
        out.append({"doc_id": row.doc_id, "n_lines": len(ls),
                    "n_kept": len(kept),
                    "clean_n_chars": len(" ".join(kept))})
    return boiler, pd.DataFrame(out)


def test_detect_and_strip_match_brute_force(ray_session):
    import ray
    import ray.data as rd

    from searchengine_ray.stages.boilerplate import (detect_boilerplate,
                                                     remove_boilerplate)

    df = _planted_corpus()
    boiler_want, out_want = _naive_expected(df)
    # headers (10/10) and promos (6/10) flagged; rare (2/10) not
    assert len(boiler_want) == 4
    ds = rd.from_pandas(df).repartition(4)
    keys = detect_boilerplate(ds, batch_size=8)
    assert len(keys) == 4
    got = (remove_boilerplate(ds, ray.put(keys), batch_size=8)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got, out_want.sort_values("doc_id").reset_index(drop=True),
        check_dtype=False)


def test_single_doc_source_never_self_boilerplates(ray_session):
    import ray
    import ray.data as rd

    from searchengine_ray.stages.boilerplate import (detect_boilerplate,
                                                     remove_boilerplate)

    df = pd.DataFrame({"doc_id": [0], "source": ["solo"],
                       "text": ["a b c d e f g h i j"]})
    ds = rd.from_pandas(df)
    keys = detect_boilerplate(ds)
    assert len(keys) == 0  # df >= 2 guard
    got = remove_boilerplate(ds, ray.put(keys)).to_pandas()
    assert got.n_lines.iloc[0] == 2 and got.n_kept.iloc[0] == 2
    assert got.clean_n_chars.iloc[0] == len("a b c d e f g h i j")
