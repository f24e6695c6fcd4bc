"""Image+caption corpus table (BASELINE.json input_hint shape) and the
banded phash near-dup operator over it.

The brute-force all-pairs hamming oracle here is the hard gate for
``hash_neardup_pairs`` (exact recall of the pigeonhole banding), the same
pattern as the embedding family's planted-dup test."""

import numpy as np
import pyarrow as pa

from searchengine_ray.functions.phash import hamming64_pairs
from searchengine_ray.sources.image_table import build_image_table


EXPECTED_SCHEMA = [
    ("image_id", pa.string()),
    ("bytes", pa.binary()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("fmt", pa.string()),
    ("caption", pa.string()),
    ("phash", pa.int64()),
]


def test_schema_matches_input_hint():
    tbl = build_image_table(40)
    assert [(f.name, f.type) for f in tbl.schema] == EXPECTED_SCHEMA


def test_deterministic():
    a = build_image_table(40)
    b = build_image_table(40)
    assert a.equals(b)


def _brute_force_pairs(ids, hashes, max_hamming):
    n = len(ids)
    ia, ib = np.triu_indices(n, k=1)
    ham = hamming64_pairs(hashes[ia], hashes[ib])
    keep = ham <= max_hamming
    out = set()
    for x, y, d in zip(ia[keep], ib[keep], ham[keep]):
        a, b = ids[x], ids[y]
        if a > b:
            a, b = b, a
        out.add((a, b, int(d)))
    return out


def test_hash_neardup_pairs_equals_brute_force(ray_session):
    import ray.data as rd

    from searchengine_ray.stages.dedup import hash_neardup_pairs

    tbl = build_image_table(150)
    ids = np.array(tbl["image_id"].to_pylist())
    hashes = np.array(tbl["phash"].to_pylist(), dtype=np.int64)
    expected = _brute_force_pairs(ids, hashes, max_hamming=4)
    # the planted image near-dups must actually produce pairs, or this
    # gate is vacuous
    assert len(expected) > 0

    ds = rd.from_arrow(tbl.select(["image_id", "phash"])).repartition(8)
    got_df = hash_neardup_pairs(ds, hash_col="phash", id_col="image_id",
                                max_hamming=4).to_pandas()
    got = set(zip(got_df["id_a"], got_df["id_b"], got_df["hamming"].astype(int)))
    assert got == expected
