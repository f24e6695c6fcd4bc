"""Compressed posting-list layout: encode→persist→decode roundtrip vs a
brute-force postings build, blob compactness, corrupt-blob detection."""

import os
import tempfile

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from searchengine_ray.stages.postings_codec import (
    decode_summary, encode_postings)


def _docs(n=120, seed=3):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 30)))
             for _ in range(n)]
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64) * 7 + 3,
                         "text": texts})


def _pairs_frame(docs: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for d, t in zip(docs["doc_id"], docs["text"]):
        for tok in set(t.split()):
            rows.append((tok, int(d)))
    return pd.DataFrame(rows, columns=["token", "doc_id"])


def test_roundtrip_matches_bruteforce(ray_session):
    docs = _docs()
    pairs = _pairs_frame(docs)
    ds = rd.from_pandas(pairs).repartition(6)
    enc = encode_postings(ds, num_buckets=8)
    scratch = tempfile.mkdtemp(prefix="graft_codec_test_")
    enc.write_parquet(scratch)
    out = (decode_summary(rd.read_parquet(scratch)).to_pandas()
           .sort_values("token").reset_index(drop=True))
    want = (pairs.groupby("token")["doc_id"]
            .agg(df="count", sum_doc_id="sum").reset_index()
            .sort_values("token").reset_index(drop=True))
    assert out["token"].tolist() == want["token"].tolist()
    np.testing.assert_array_equal(out["df"].to_numpy(),
                                  want["df"].to_numpy())
    np.testing.assert_array_equal(out["sum_doc_id"].to_numpy(),
                                  want["sum_doc_id"].to_numpy())
    # gap-encoded blobs must beat 8-byte fixed width
    assert int(out["n_bytes"].sum()) < 8 * len(pairs)


def test_blob_bytes_match_reference_varint(ray_session):
    # one token with known doc ids: blob is exactly the reference encoding
    pairs = pd.DataFrame({"token": ["t"] * 4,
                          "doc_id": np.array([0, 127, 128, 300],
                                             dtype=np.int64)})
    enc = encode_postings(rd.from_pandas(pairs), num_buckets=2).to_pandas()
    assert len(enc) == 1

    def ref(v):
        out = bytearray()
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    # gaps: 0, 127, 1, 172
    want = b"".join(ref(g) for g in (0, 127, 1, 172))
    assert bytes(enc["blob"].iloc[0]) == want
    assert int(enc["n_bytes"].iloc[0]) == len(want)


def test_truncated_blob_raises(ray_session):
    pairs = pd.DataFrame({"token": ["t", "t"],
                          "doc_id": np.array([0, 500], dtype=np.int64)})
    enc = encode_postings(rd.from_pandas(pairs), num_buckets=2).to_pandas()
    bad = enc.copy()
    bad["blob"] = [bytes(b)[:-1] for b in bad["blob"]]
    with pytest.raises(Exception):
        decode_summary(rd.from_pandas(bad)).to_pandas()


def test_tf_codec_roundtrip_with_blocks(ray_session):
    from searchengine_ray.stages.postings_codec import (
        decode_postings_tf, encode_postings_tf)

    rng = np.random.default_rng(17)
    rows = []
    for t in range(12):
        n = int(rng.integers(1, 40))
        ids = np.sort(rng.choice(np.arange(10_000), size=n, replace=False))
        for d in ids:
            rows.append((f"t{t}", int(d), int(rng.integers(1, 9)),
                         int(rng.integers(5, 300))))
    tc = pd.DataFrame(rows, columns=["token", "doc_id", "cnt", "doc_len"])
    # chunk_size=7 forces multi-block lists with delta restarts
    enc = encode_postings_tf(rd.from_pandas(tc).repartition(4),
                             chunk_size=7, num_buckets=6).to_pandas()
    assert (enc.groupby("token")["chunk_id"].max() >= 1).any()
    assert (enc["df"] <= 7).all()
    got = (decode_postings_tf(rd.from_pandas(enc)).to_pandas()
           .sort_values(["token", "doc_id"]).reset_index(drop=True))
    want = tc.sort_values(["token", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": np.int64, "cnt": np.int64,
                    "doc_len": np.int64}), want)


def test_tf_codec_blocks_decode_independently(ray_session):
    from searchengine_ray.stages.postings_codec import (
        decode_postings_tf, encode_postings_tf)

    ids = np.arange(0, 1000, 13, dtype=np.int64)
    tc = pd.DataFrame({"token": "w", "doc_id": ids,
                       "cnt": np.ones(len(ids), dtype=np.int64),
                       "doc_len": np.full(len(ids), 50, dtype=np.int64)})
    enc = encode_postings_tf(rd.from_pandas(tc), chunk_size=10,
                             num_buckets=2).to_pandas()
    assert len(enc) > 1
    # each block row alone reconstructs exactly its slice (delta restart)
    for _, row in enc.iterrows():
        one = decode_postings_tf(
            rd.from_pandas(pd.DataFrame([row]))).to_pandas()
        lo = int(row["chunk_id"]) * 10
        np.testing.assert_array_equal(one["doc_id"].to_numpy(),
                                      ids[lo:lo + int(row["df"])])


def test_tf_codec_corrupt_raises(ray_session):
    from searchengine_ray.stages.postings_codec import (
        decode_postings_tf, encode_postings_tf)

    tc = pd.DataFrame({"token": ["w", "w"], "doc_id": [1, 5],
                       "cnt": [2, 1], "doc_len": [9, 9]})
    enc = encode_postings_tf(rd.from_pandas(tc), num_buckets=2).to_pandas()
    bad = enc.copy()
    # drop one whole varint (the trailing doc_len byte): value count no
    # longer divisible by 3
    bad["blob"] = [bytes(b)[:-1] for b in bad["blob"]]
    with pytest.raises(Exception):
        decode_postings_tf(rd.from_pandas(bad)).to_pandas()
