"""Gopher document-quality rule battery (pipelines/queries.q_gopher_rules).

The sf corpus is single-line ASCII, so the bullet/ellipsis line rules are
vacuous there — this planted fixture gives every rule a case that FAILS
it, and gates the engine against DuckDB running the registered oracle SQL
on the same fixture (full non-vacuity of the SQL, not just the kernel).
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _fixture(tmp_path):
    good = " ".join(["the", "and", "for", "that"] * 15)        # 60 words, all rules pass
    short = "the and word here"                                # fails r_words
    longw = " ".join(["x" * 40] * 60)                          # fails r_meanlen (and stop/...)
    bullets = "\n".join(["- item " + "word " * 9] * 10)        # 10/10 bullet lines
    dots = "\n".join([("the and word row " * 4) + "..."] * 10)  # 10/10 "..." lines
    digits = " ".join(["12345"] * 60) + " the and"             # fails r_alpha
    nostop = " ".join(["alpha", "beta", "gamma"] * 20)         # fails r_stop
    texts = [good, short, longw, bullets, dots, digits, nostop]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string()),
                  "lang": pa.array(["en"] * len(texts)),
                  "source": pa.array(["s0"] * len(texts))})
    pq.write_table(t, tmp_path / "documents.parquet")
    return tmp_path


def test_every_rule_bites_and_sql_agrees(ray_session, tmp_path):
    from searchengine_ray.pipelines.queries import (SQL_GOPHER_RULES,
                                                    q_gopher_rules)

    sf = str(_fixture(tmp_path))
    got = (q_gopher_rules(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    by = {int(r.doc_id): r for r in got.itertuples()}
    assert by[0].keep == 1                                    # clean doc
    assert by[1].r_words == 0 and by[1].keep == 0             # too short
    assert by[2].r_meanlen == 0 and by[2].keep == 0           # 40-char words
    assert by[3].r_bullets == 0 and by[3].keep == 0           # all-bullet doc
    assert by[4].r_ellipsis == 0 and by[4].keep == 0          # all-"..." doc
    assert by[5].r_alpha == 0 and by[5].keep == 0             # digit words
    assert by[6].r_stop == 0 and by[6].keep == 0              # no stopwords
    # the registered oracle SQL agrees on the planted fixture
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = (con.sql(SQL_GOPHER_RULES).df()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype(np.int64), want.astype(np.int64))
