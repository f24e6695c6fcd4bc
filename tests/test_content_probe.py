"""Compact StoreIndex property tests: batch probe flags must equal the
brute-force jaccard/hamming definitions, across multi-delta chains and
through segment compaction."""

import numpy as np
import pyarrow as pa
import pytest

from searchengine_ray.functions.phash import hamming64
from searchengine_ray.stages.content_probe import StoreIndex, probe_batch

MAX_SIM = 0.65
MAX_HAM = 4


def _delta(rng, n, vocab=60, max_len=9):
    shingles = []
    for _ in range(n):
        k = rng.randint(0, max_len)
        shingles.append(sorted(set(rng.randint(0, vocab, size=k).tolist())))
    phashes = rng.randint(-(1 << 62), 1 << 62, size=n).tolist()
    return pa.table({
        "seq": pa.array(range(n), pa.int64()),
        "shingles": pa.array(shingles, pa.list_(pa.int64())),
        "phash": pa.array(phashes, pa.int64()),
    })


def _brute_text(cand_set, store_sets):
    for prev in store_sets:
        union = cand_set | prev
        if union and len(cand_set & prev) / len(union) > MAX_SIM:
            return True
    return False


def _brute_image(ph, store_ph):
    return any(hamming64(ph, q) <= MAX_HAM for q in store_ph)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_probe_flags_match_brute_force(seed):
    rng = np.random.RandomState(seed)
    idx = StoreIndex(MAX_HAM)
    store_sets, store_ph = [], []
    for _ in range(4):  # multi-delta chain
        d = _delta(rng, rng.randint(1, 40))
        idx.add_table(d)
        store_sets += [set(s) for s in d["shingles"].to_pylist()]
        store_ph += d["phash"].to_pylist()
    # candidates: random + exact copies of store rows + near-miss phashes
    cand_sh = [sorted(set(rng.randint(0, 60, size=rng.randint(0, 9)).tolist()))
               for _ in range(30)]
    cand_ph = rng.randint(-(1 << 62), 1 << 62, size=30).tolist()
    for j in range(5):
        cand_sh.append(sorted(store_sets[j]))
        cand_ph.append(int(store_ph[j]) ^ (1 << j))  # hamming 1
    statuses = [200] * len(cand_ph)
    statuses[3] = 404  # dead rows never probe
    text, image = probe_batch(cand_sh, cand_ph, statuses, idx, MAX_SIM)
    for i, (sh, ph) in enumerate(zip(cand_sh, cand_ph)):
        if statuses[i] != 200:
            assert not text[i] and not image[i]
            continue
        assert text[i] == _brute_text(set(sh), store_sets), i
        assert image[i] == _brute_image(ph, store_ph), i


def test_compaction_preserves_probes():
    rng = np.random.RandomState(7)
    a = StoreIndex(MAX_HAM)
    b = StoreIndex(MAX_HAM)
    b.COMPACT_AT = 3  # force merges
    deltas = [_delta(rng, rng.randint(1, 25)) for _ in range(10)]
    for d in deltas:
        a.add_table(d)
        b.add_table(d)
    assert len(b.segments) < len(a.segments)
    cand_sh = [sorted(set(rng.randint(0, 60, size=rng.randint(0, 9)).tolist()))
               for _ in range(40)]
    cand_ph = rng.randint(-(1 << 62), 1 << 62, size=40).tolist()
    st = [200] * 40
    ta, ia = probe_batch(cand_sh, cand_ph, st, a, MAX_SIM)
    tb, ib = probe_batch(cand_sh, cand_ph, st, b, MAX_SIM)
    np.testing.assert_array_equal(ta, tb)
    np.testing.assert_array_equal(ia, ib)
