"""Temperature sampling: brute-force equality, skew actually rebalances,
threshold parity with the SQL hex ladder, stratum-cap guard."""

from hashlib import sha256

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from searchengine_ray.stages.sampling import HEX_DIGITS, temperature_mix


def _frame():
    rng = np.random.default_rng(13)
    # heavily skewed strata: 600 / 150 / 40 / 40 rows
    strata = (["en"] * 600 + ["de"] * 150 + ["fr"] * 40 + ["zh"] * 40)
    rng.shuffle(strata)
    return pd.DataFrame({"doc_id": np.arange(len(strata), dtype=np.int64),
                         "lang": strata})


def _brute(df: pd.DataFrame, salt: str) -> pd.DataFrame:
    counts = df["lang"].value_counts()
    mn = int(counts.min())
    keep_rows = []
    for _, row in df.iterrows():
        n = int(counts[row["lang"]])
        if n == mn:
            thr = "g"
        else:
            thr = format(int(np.sqrt(np.float64(mn) / np.float64(n))
                             * 16 ** HEX_DIGITS), f"0{HEX_DIGITS}x")
        h = sha256(f"{row['doc_id']}:{salt}".encode()).hexdigest()[:HEX_DIGITS]
        if h < thr:
            keep_rows.append(row)
    return pd.DataFrame(keep_rows).reset_index(drop=True)


def test_matches_bruteforce(ray_session):
    df = _frame()
    got = (temperature_mix(rd.from_pandas(df).repartition(4),
                           "doc_id", "lang", "t1")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = _brute(df, "t1").sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_rebalances_toward_sqrt(ray_session):
    df = _frame()
    got = temperature_mix(rd.from_pandas(df), "doc_id", "lang",
                          "t2").to_pandas()
    kept = got["lang"].value_counts()
    n = df["lang"].value_counts()
    # smallest strata keep everything
    assert kept["fr"] == n["fr"] and kept["zh"] == n["zh"]
    # expected kept_s = sqrt(mn * n_s); binomial tolerance
    for s in ("en", "de"):
        exp = np.sqrt(40 * n[s])
        assert abs(kept[s] - exp) < 4 * np.sqrt(exp), (s, kept[s], exp)
    # the raw 4:1 en:de imbalance compresses toward 2:1
    assert kept["en"] / kept["de"] < 2.8


def test_deterministic_and_salt_sensitive(ray_session):
    df = _frame()
    a = temperature_mix(rd.from_pandas(df), "doc_id", "lang",
                        "s1").to_pandas()
    b = temperature_mix(rd.from_pandas(df), "doc_id", "lang",
                        "s1").to_pandas()
    c = temperature_mix(rd.from_pandas(df), "doc_id", "lang",
                        "s2").to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    assert sorted(a["doc_id"]) != sorted(c["doc_id"])


def test_strata_cap_raises(ray_session):
    df = pd.DataFrame({"doc_id": np.arange(10, dtype=np.int64),
                       "lang": [f"l{i}" for i in range(10)]})
    with pytest.raises(ValueError, match="max_strata"):
        temperature_mix(rd.from_pandas(df), "doc_id", "lang", "x",
                        max_strata=5)
