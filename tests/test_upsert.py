"""upsert_merge conformance: brute-force semantics, route equality,
tombstone / resurrect / insert cases, duplicate-(id,version) rejection.

The oracle gate (SQL_UPSERT_MERGE) proves the composed pipeline at
driver-comparison fidelity; these pin the operator on crafted frames and
pin the broadcast route ≡ the co-shuffle route on identical input.
"""

import numpy as np
import pandas as pd
import pytest


def _mk(rows):
    """rows: list of (doc_id, version, deleted, text)."""
    return pd.DataFrame({
        "doc_id": np.array([r[0] for r in rows], dtype=np.int64),
        "version": np.array([r[1] for r in rows], dtype=np.int64),
        "deleted": np.array([r[2] for r in rows], dtype=bool),
        "text": np.array([r[3] for r in rows], dtype=object)})


def _naive(base, delta):
    u = pd.concat([base, delta], ignore_index=True)
    assert not u.duplicated(["doc_id", "version"]).any()
    u = (u.sort_values(["doc_id", "version"]).groupby("doc_id").tail(1))
    u = u[~u["deleted"]]
    return (u[["doc_id", "version", "text"]]
            .sort_values("doc_id").reset_index(drop=True))


def _run(base_df, delta_df, **kw):
    import ray.data as rd

    from searchengine_ray.stages.relational import upsert_merge

    base = rd.from_pandas(base_df).repartition(4)
    delta = rd.from_pandas(delta_df).repartition(2)
    out = upsert_merge(base, delta, id_col="doc_id", **kw).to_pandas()
    return (out[["doc_id", "version", "text"]].astype({"doc_id": np.int64})
            .sort_values("doc_id").reset_index(drop=True))


BASE = _mk([(i, 0, False, f"doc {i}") for i in range(40)])
DELTA = _mk(
    # update / tombstone / resurrect-past-tombstone / stale(loses) / insert
    [(3, 1, False, "doc 3 rev2"), (5, 2, True, ""),
     (7, 2, True, ""), (7, 3, False, "doc 7 back"),
     (11, 1, True, ""), (11, 2, False, "doc 11 back"),
     (100, 1, False, "new 100"), (101, 4, True, "")])


@pytest.mark.parametrize("route_kw", [{}, {"broadcast_limit": 0}],
                         ids=["broadcast", "coshuffle"])
def test_semantics_both_routes(ray_session, route_kw):
    got = _run(BASE, DELTA, **route_kw)
    want = _naive(BASE, DELTA)
    pd.testing.assert_frame_equal(got, want)
    # spot semantics: 5 deleted, 7 & 11 resurrected, 100 inserted,
    # 101's tombstone for an absent id is a no-op
    ids = set(got["doc_id"])
    assert 5 not in ids and 7 in ids and 11 in ids and 100 in ids
    assert 101 not in ids
    assert got.loc[got.doc_id == 7, "text"].item() == "doc 7 back"
    assert got.loc[got.doc_id == 3, "version"].item() == 1


def test_stale_delta_version_loses(ray_session):
    """Keep-max is real on both routes: a delta row with a LOWER version
    than the base snapshot must not replace it."""
    base = _mk([(1, 5, False, "fresh"), (2, 0, False, "two")])
    delta = _mk([(1, 3, False, "stale"), (1, 4, True, "")])
    for kw in ({}, {"broadcast_limit": 0}):
        got = _run(base, delta, **kw)
        assert got.loc[got.doc_id == 1, "text"].item() == "fresh"
        assert got.loc[got.doc_id == 1, "version"].item() == 5


@pytest.mark.parametrize("route_kw", [{}, {"broadcast_limit": 0}],
                         ids=["broadcast", "coshuffle"])
def test_duplicate_id_version_raises(ray_session, route_kw):
    base = _mk([(1, 0, False, "a")])
    delta = _mk([(1, 0, False, "b")])
    with pytest.raises(Exception, match="duplicate"):
        _run(base, delta, **route_kw)


def test_randomized_vs_naive(ray_session):
    rng = np.random.default_rng(7)
    base = _mk([(i, int(rng.integers(0, 3)), False, f"b{i}")
                for i in range(200)])
    picks = rng.permutation(260)[:120]
    delta = _mk([(int(i), int(10 + rng.integers(0, 5)) if j % 3 else 5,
                  bool(j % 4 == 0), f"d{i}.{j}")
                 for j, i in enumerate(picks)])
    delta = delta[~delta.duplicated(["doc_id", "version"])]
    for kw in ({}, {"broadcast_limit": 0}):
        got = _run(base, delta, **kw)
        pd.testing.assert_frame_equal(got, _naive(base, delta))


def test_time_travel_vs_full_merge(ray_session):
    """As-of v2 differs from the full merge exactly where v3 acted:
    273-divisible ids are resurrected at v3 in the full merge but stay
    tombstoned as of v2; 21-divisible ids show ' rev2' not ' rev3'."""
    from searchengine_ray.pipelines.queries import q_time_travel, q_upsert_merge

    sf = "/root/testdata/sf0.001"
    asof = q_time_travel(sf).to_pandas().set_index("doc_id")
    full = q_upsert_merge(sf).to_pandas().set_index("doc_id")

    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id"])
    ids = docs["doc_id"].to_numpy()
    m273 = ids[(ids % 273 == 0)]
    m21 = ids[(ids % 21 == 0) & (ids % 13 != 0)]
    assert len(m21) > 0  # the plant binds at this scale
    for i in m273:
        assert i in full.index and i not in asof.index
    for i in m21:
        assert full.loc[i, "version"] == 3 and asof.loc[i, "version"] == 1
        assert str(full.loc[i, "text"]).endswith(" rev3")
        assert str(asof.loc[i, "text"]).endswith(" rev2")
    # everything v3 never touched is identical between the two snapshots
    untouched = asof.index[~np.isin(asof.index.to_numpy() % 21, [0])]
    pd.testing.assert_frame_equal(asof.loc[untouched].sort_index(),
                                  full.loc[untouched].sort_index())
