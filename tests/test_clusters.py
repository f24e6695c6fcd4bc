"""Cluster-resolution operator: connected components over near-dup pair
outputs + keep-best survivors.

Gates:
- planted transitive chains (incl. a long path that needs >diameter-free
  convergence, i.e. pointer jumping must engage);
- property test vs a sequential union-find reference on random graphs;
- string node ids (image URLs);
- survivor selection + cluster sizes over a corpus with singletons.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from searchengine_ray.stages.clusters import (
    attach_clusters, cluster_survivors, connected_components)


def _union_find_reference(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _run_cc(pairs, **kw):
    df = pd.DataFrame(pairs, columns=["doc_a", "doc_b"])
    ds = rd.from_pandas(df).repartition(4)
    out = connected_components(ds, **kw).to_pandas()
    return dict(zip(out["node"], out["cluster_id"]))


# driver_threshold=0 forces the distributed label-propagation route;
# the default takes the driver union-find fast path — both must land on
# the same (unique) min-label fixed point
ROUTES = [{"driver_threshold": 0}, {}]


@pytest.mark.parametrize("route", ROUTES)
def test_transitive_chain_and_long_path(ray_session, route):
    # A-B, B-C transitive (A-C never a pair) + a diameter-11 path — the
    # shape plain per-round propagation would need 11 rounds for
    path = [(i, i + 1) for i in range(30, 41)]
    pairs = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)] + path
    got = _run_cc(pairs, **route)
    want = _union_find_reference(pairs)
    assert got == want
    assert got[3] == 1 and got[40] == 30 and got[22] == 20


@pytest.mark.parametrize("route", ROUTES)
def test_random_graphs_match_union_find(ray_session, route):
    rng = np.random.RandomState(7)
    for trial in range(3):
        n = 60
        m = rng.randint(10, 80)
        pairs = set()
        while len(pairs) < m:
            a, b = rng.randint(0, n, size=2)
            if a != b:
                pairs.add((min(a, b), max(a, b)))
        pairs = sorted(pairs)
        assert _run_cc(pairs, **route) == _union_find_reference(pairs)


@pytest.mark.parametrize("route", ROUTES)
def test_string_node_ids(ray_session, route):
    pairs = [("http://h/a", "http://h/b"), ("http://h/b", "http://h/c"),
             ("http://x/1", "http://x/2")]
    got = _run_cc(pairs, **route)
    assert got["http://h/c"] == "http://h/a"
    assert got["http://x/2"] == "http://x/1"


def test_attach_and_survivors(ray_session):
    pairs = rd.from_pandas(pd.DataFrame(
        {"doc_a": [1, 2, 10], "doc_b": [2, 3, 11]}))
    comps = connected_components(pairs)
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 10, 11, 99],
        "quality": [5.0, 9.0, 9.0, 1.0, 2.0, 7.0]})
    ds = rd.from_pandas(docs).repartition(3)

    att = attach_clusters(ds, comps, "doc_id").to_pandas()
    cl = dict(zip(att["doc_id"], att["cluster_id"]))
    assert cl == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}
    assert att["cluster_id"].dtype == np.int64

    surv = cluster_survivors(ds, comps, "doc_id",
                             better=[("quality", False)]).to_pandas()
    surv = surv.sort_values("cluster_id").reset_index(drop=True)
    # cluster 1: quality tie 9.0 between docs 2,3 → min doc_id wins (2)
    assert surv["doc_id"].tolist() == [2, 11, 99]
    assert surv["n_members"].tolist() == [3, 2, 1]


def test_cc_does_not_converge_guard(ray_session):
    with pytest.raises(RuntimeError):
        _run_cc([(i, i + 1) for i in range(0, 40)], max_rounds=2,
                driver_threshold=0)
