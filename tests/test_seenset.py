"""SeenSet (LSM digest set) — exactness vs a plain Python set under heavy
flush/compact churn, plus the sorted-dump contract the gate spill relies on."""

import hashlib

import numpy as np

from searchengine_ray.state.seenset import SeenSet


def _digest(i: int) -> bytes:
    return hashlib.sha256(f"url-{i}".encode()).digest()


def test_seenset_matches_python_set_across_flushes():
    rng = np.random.RandomState(3)
    s = SeenSet(flush_at=64, compact_at=3)  # tiny bounds → constant churn
    ref: set[bytes] = set()
    for i in rng.randint(0, 2000, size=5000):
        d = _digest(int(i))
        if d not in ref:  # gate contract: add only after a miss probe
            if d in s:
                raise AssertionError("false positive")
            s.add(d)
            ref.add(d)
        else:
            assert d in s
    assert len(s) == len(ref)
    # full membership sweep, including misses
    for i in range(2500):
        d = _digest(i)
        assert (d in s) == (d in ref)
    # iteration covers every digest exactly once
    assert set(s) == ref


def test_seenset_sorted_digests_and_hex_order():
    s = SeenSet(flush_at=16, compact_at=2)
    digests = {_digest(i) for i in range(300)}
    for d in digests:
        s.add(d)
    out = s.sorted_digests()
    assert out == sorted(digests)
    # byte order ≡ lowercase-hex string order (the dump writes hex)
    hexes = [d.hex() for d in out]
    assert hexes == sorted(hexes)
    # a dump must not lose the active (unflushed) tail
    assert len(out) == 300


def test_seenset_nbytes_is_array_dominated():
    s = SeenSet(flush_at=1024)
    for i in range(10_000):
        s.add(_digest(i))
    # ≤ ~40 B/URL amortized (32 B segment payload + bounded active set)
    assert s.nbytes() / 10_000 < 64
