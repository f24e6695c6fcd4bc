"""Distributed PageRank (stages/graph.py) vs a numpy reference."""

import numpy as np
import pandas as pd
import pytest


def _pagerank_ref(edges, n, iters, damping=0.85):
    deg = np.zeros(n)
    for s, _ in edges:
        deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1 - damping) / n)
        for s, d in edges:
            nxt[d] += damping * r[s] / deg[s]
        r = nxt
    return r


def test_pagerank_matches_numpy_reference(ray_session):
    import ray.data as rd

    from searchengine_ray.stages.graph import pagerank

    rng = np.random.RandomState(11)
    n = 60
    # closed graph: a ring (guarantees every node has in+out edges) plus
    # random extra edges
    edges = [(i, (i + 1) % n) for i in range(n)]
    for _ in range(150):
        s, d = rng.randint(0, n, 2)
        if s != d:
            edges.append((int(s), int(d)))
    edges = sorted(set(edges))
    df = pd.DataFrame(edges, columns=["src", "dst"])
    out = (pagerank(rd.from_pandas(df).repartition(4), num_nodes=n, iters=3)
           .to_pandas().set_index("node").sort_index())
    ref = _pagerank_ref(edges, n, iters=3)
    assert len(out) == n
    np.testing.assert_allclose(out["pagerank"].to_numpy(), np.round(ref, 6),
                               atol=1.5e-6)
    # a probability distribution (closed graph conserves mass)
    assert out["pagerank"].sum() == pytest.approx(1.0, abs=1e-3)


def test_pagerank_ranks_hub_highest(ray_session):
    import ray.data as rd

    from searchengine_ray.stages.graph import pagerank

    # star + ring: every node points at 0 (and to its ring successor)
    n = 20
    edges = [(i, 0) for i in range(1, n)] + [(i, (i + 1) % n)
                                             for i in range(n)]
    df = pd.DataFrame(sorted(set(edges)), columns=["src", "dst"])
    out = (pagerank(rd.from_pandas(df), num_nodes=n, iters=3)
           .to_pandas().sort_values("pagerank", ascending=False))
    assert int(out.iloc[0]["node"]) == 0


def test_pagerank_routes_identical(ray_session):
    """Broadcast-rank route ≡ fully distributed route (forced via
    broadcast_threshold=0) on the same graph."""
    import ray.data as rd

    from searchengine_ray.stages.graph import pagerank

    rng = np.random.RandomState(4)
    n = 40
    edges = [(i, (i + 1) % n) for i in range(n)]
    for _ in range(80):
        s, d = rng.randint(0, n, 2)
        if s != d:
            edges.append((int(s), int(d)))
    df = pd.DataFrame(sorted(set(edges)), columns=["src", "dst"])
    ds = rd.from_pandas(df).repartition(3)
    a = (pagerank(ds, num_nodes=n, iters=3).to_pandas()
         .sort_values("node").reset_index(drop=True))
    b = (pagerank(ds, num_nodes=n, iters=3, broadcast_threshold=0)
         .to_pandas().sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_pagerank_rejects_bad_n(ray_session):
    import ray.data as rd

    from searchengine_ray.stages.graph import pagerank

    df = pd.DataFrame({"src": [0], "dst": [1]})
    with pytest.raises(ValueError):
        pagerank(rd.from_pandas(df), num_nodes=0)


def _brute_triangles(pairs):
    import itertools

    adj = {}
    for u, v in pairs:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return sum(1 for a, b, c in itertools.combinations(sorted(adj), 3)
               if b in adj[a] and c in adj[a] and c in adj[b])


def test_triangle_count_known_and_random(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from searchengine_ray.stages.graph import triangle_count

    # K4 = 4 triangles, plus a pendant edge and a duplicate/reversed/self
    # edge that must all collapse away
    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
          (3, 4), (1, 0), (2, 2), (0, 1)]
    ds = rd.from_pandas(pd.DataFrame(k4, columns=["src", "dst"])).repartition(3)
    assert triangle_count(ds) == 4

    # random dense-ish graph: many distinct forward-degrees in one bucket
    rng = np.random.default_rng(99)
    m = rng.integers(0, 60, size=(800, 2))
    pairs = [tuple(r) for r in m]
    ds2 = rd.from_pandas(pd.DataFrame(pairs, columns=["src", "dst"])
                         ).repartition(4)
    assert triangle_count(ds2) == _brute_triangles(pairs)


def test_covisit_pairs_matches_brute_force(ray_session):
    import json

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from searchengine_ray.pipelines.queries import q_covisit_pairs

    sf = "/root/testdata/sf0.01"
    got = (q_covisit_pairs(sf).to_pandas()
           .sort_values(["item_a", "item_b"]).reset_index(drop=True))

    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["user_id", "props"]).to_pandas()
    ev["item"] = [json.loads(p)["k"] for p in ev["props"]]
    ui = ev[["user_id", "item"]].drop_duplicates()
    # the cap must actually bind somewhere or this test is vacuous
    assert (ui.groupby("user_id").size() > 20).any()
    from collections import Counter

    c = Counter()
    for _, g in ui.groupby("user_id"):
        items = sorted(g["item"])[:20]
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                c[(items[i], items[j])] += 1
    want = (pd.DataFrame([(a, b, n) for (a, b), n in c.items() if n >= 5],
                         columns=["item_a", "item_b", "n_users"])
            .sort_values(["item_a", "item_b"]).reset_index(drop=True))
    assert len(want) > 0
    pd.testing.assert_frame_equal(got.astype(np.int64),
                                  want.astype(np.int64))


def test_decayed_engagement_matches_brute_force(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from searchengine_ray.pipelines.queries import q_decayed_engagement

    sf = "/root/testdata/sf0.001"
    got = (q_decayed_engagement(sf).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["user_id", "ts", "value"]).to_pandas()
    tmax = ev["ts"].astype("int64").max()
    ev["w"] = ev["value"] * np.exp(-(tmax - ev["ts"].astype("int64"))
                                   / (7 * 86400 * 1_000_000))
    want = (ev.groupby("user_id")["w"].sum().round(6).reset_index()
            .rename(columns={"w": "score"})
            .sort_values("user_id").reset_index(drop=True))
    assert len(got) == len(want)
    assert (got["user_id"].to_numpy() == want["user_id"].to_numpy()).all()
    assert np.allclose(got["score"], want["score"], atol=1e-6)
    # decay is real: recent events dominate — the score is below the
    # undecayed sum for every user with any old activity
    raw = ev.groupby("user_id")["value"].sum()
    assert (got.set_index("user_id")["score"] <= raw + 1e-9).all()
    assert (got.set_index("user_id")["score"] < raw).any()


# --- multi-source BFS ---------------------------------------------------------


def _bfs_brute(edges_df, seeds, max_hops):
    import collections
    adj = collections.defaultdict(list)
    for s, d in zip(edges_df["src"], edges_df["dst"]):
        adj[int(s)].append(int(d))
    dist = {int(s): 0 for s in seeds}
    frontier = sorted(dist)
    for h in range(1, max_hops + 1):
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = h
                    nxt.append(v)
        frontier = nxt
    return dist


def test_bfs_matches_brute_force_both_routes(ray_session):
    import ray.data as rd

    from searchengine_ray.stages.graph import multi_source_bfs

    rng = np.random.default_rng(17)
    edges_df = pd.DataFrame({
        "src": rng.integers(0, 200, 900).astype(np.int64),
        "dst": rng.integers(0, 200, 900).astype(np.int64)})
    edges_df = edges_df[edges_df.src != edges_df.dst].reset_index(drop=True)
    seeds = [0, 5, 111]
    ref = _bfs_brute(edges_df, seeds, 3)
    for forced in (False, True):
        got = (multi_source_bfs(rd.from_pandas(edges_df).repartition(4),
                                seeds, 3, force_distributed=forced)
               .to_pandas().sort_values("node").reset_index(drop=True))
        assert dict(zip(got["node"], got["hop"])) == ref, f"forced={forced}"
        assert got["hop"].dtype == np.int64 and got["node"].dtype == np.int64


def test_bfs_hop_zero_and_unreachable(ray_session):
    import ray.data as rd

    from searchengine_ray.stages.graph import multi_source_bfs

    # 0→1→2→3 chain plus isolated 9: hops bind exactly, 9 never appears
    edges_df = pd.DataFrame({"src": [0, 1, 2, 8],
                             "dst": [1, 2, 3, 9]}).astype(np.int64)
    got = (multi_source_bfs(rd.from_pandas(edges_df), [0], 2)
           .to_pandas().sort_values("node"))
    assert dict(zip(got["node"], got["hop"])) == {0: 0, 1: 1, 2: 2}
    # max_hops=0: seeds only
    got0 = multi_source_bfs(rd.from_pandas(edges_df), [3, 0], 0).to_pandas()
    assert dict(zip(got0["node"], got0["hop"])) == {0: 0, 3: 0}


def test_bfs_min_hop_on_multiple_paths(ray_session):
    import ray.data as rd

    from searchengine_ray.stages.graph import multi_source_bfs

    # node 4 reachable at hop 2 (0→1→4) and hop 1 (5→4): min wins
    edges_df = pd.DataFrame({"src": [0, 1, 5],
                             "dst": [1, 4, 4]}).astype(np.int64)
    got = (multi_source_bfs(rd.from_pandas(edges_df), [0, 5], 3)
           .to_pandas())
    assert dict(zip(got["node"], got["hop"]))[4] == 1


# --- neighborhood feature aggregation -----------------------------------------


def test_neighborhood_aggregate_matches_brute_force_both_routes(ray_session):
    import ray.data as rd

    from searchengine_ray.stages.graph import neighborhood_aggregate

    rng = np.random.default_rng(43)
    edges_df = pd.DataFrame({
        "src": rng.integers(0, 60, 300).astype(np.int64),
        "dst": rng.integers(0, 60, 300).astype(np.int64)})
    edges_df = (edges_df[edges_df.src != edges_df.dst]
                .drop_duplicates().reset_index(drop=True))
    feats_df = pd.DataFrame({"node": np.arange(60, dtype=np.int64),
                             "f": rng.uniform(10, 500, 60)})
    # brute force: two rounds of in-neighbor means
    fmap = dict(zip(feats_df["node"], feats_df["f"]))
    def one_round(fm):
        out = {}
        for dst, grp in edges_df.groupby("dst"):
            vals = [fm[s] for s in grp["src"] if s in fm]
            if vals:
                out[int(dst)] = sum(vals) / len(vals)
        return out
    h1 = one_round(fmap)
    h2 = one_round(h1)
    nodes = sorted(set(h1) & set(h2))
    for forced in (False, True):
        got = (neighborhood_aggregate(
            rd.from_pandas(edges_df).repartition(4),
            rd.from_pandas(feats_df).repartition(3),
            rounds=2, force_distributed=forced)
            .to_pandas().sort_values("node").reset_index(drop=True))
        assert got["node"].tolist() == nodes, f"forced={forced}"
        np.testing.assert_allclose(
            got["f1"], [round(h1[v], 6) for v in nodes], atol=2e-6)
        np.testing.assert_allclose(
            got["f2"], [round(h2[v], 6) for v in nodes], atol=2e-6)


def test_neighborhood_aggregate_exact_small(ray_session):
    import ray.data as rd

    from searchengine_ray.stages.graph import neighborhood_aggregate

    # 0→2, 1→2, 2→0: f1(2) = mean(f0, f1), f1(0) = f2; round 2 chains
    edges_df = pd.DataFrame({"src": [0, 1, 2], "dst": [2, 2, 0]}).astype(
        np.int64)
    feats_df = pd.DataFrame({"node": [0, 1, 2],
                             "f": [10.0, 20.0, 40.0]})
    got = (neighborhood_aggregate(rd.from_pandas(edges_df),
                                  rd.from_pandas(feats_df), rounds=2)
           .to_pandas().set_index("node"))
    assert got.loc[2, "f1"] == 15.0 and got.loc[0, "f1"] == 40.0
    # round 2: f2(2) = mean(f1(0)) path needs f1 for 0 AND 1 — node 1
    # has no f1 (no in-edges) so only edge 2→0 and 0→2 contribute where
    # sources have f1: f2(0) = f1(2) = 15, f2(2) = f1(0) = 40
    assert got.loc[0, "f2"] == 15.0 and got.loc[2, "f2"] == 40.0


# --- label propagation communities --------------------------------------------


def test_label_propagation_matches_brute_force(ray_session):
    import ray.data as rd

    from searchengine_ray.stages.graph import label_propagation

    rng = np.random.default_rng(47)
    edges_df = pd.DataFrame({
        "src": rng.integers(0, 50, 260).astype(np.int64),
        "dst": rng.integers(0, 50, 260).astype(np.int64)})
    edges_df = (edges_df[edges_df.src != edges_df.dst]
                .drop_duplicates().reset_index(drop=True))
    got = (label_propagation(rd.from_pandas(edges_df).repartition(4),
                             num_nodes=50, rounds=3)
           .to_pandas().sort_values("node").reset_index(drop=True))
    # brute force: synchronous, mode of in-neighbor labels, min tiebreak
    import collections
    nodes = sorted(set(edges_df["src"]) | set(edges_df["dst"]))
    lab = {v: v for v in nodes}
    inn = collections.defaultdict(list)
    for s, d in zip(edges_df["src"], edges_df["dst"]):
        inn[int(d)].append(int(s))
    for _ in range(3):
        new = dict(lab)
        for v in nodes:
            if inn[v]:
                cnt = collections.Counter(lab[u] for u in inn[v])
                best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
                new[v] = best[0]
        lab = new
    assert dict(zip(got["node"], got["community"])) == lab


def test_label_propagation_two_cliques_converge(ray_session):
    import ray.data as rd

    from searchengine_ray.stages.graph import label_propagation

    # two disjoint directed triangles: each collapses to its min label
    edges_df = pd.DataFrame({
        "src": [0, 1, 2, 0, 1, 2, 10, 11, 12, 10, 11, 12],
        "dst": [1, 2, 0, 2, 0, 1, 11, 12, 10, 12, 10, 11]}).astype(np.int64)
    got = (label_propagation(rd.from_pandas(edges_df), num_nodes=6,
                             rounds=3).to_pandas())
    comm = dict(zip(got["node"], got["community"]))
    assert comm[0] == comm[1] == comm[2] == 0
    assert comm[10] == comm[11] == comm[12] == 10


def test_label_propagation_routes_identical(ray_session):
    """The distributed route (labels stay a Dataset: hash_join + anti-join
    carry-forward per round, forced via broadcast_threshold=0) must equal
    the broadcast route EXACTLY — both run the same deterministic integer
    update kernel.  Fixture includes never-a-dst sources (the src∪dst init
    invariant) and isolated in-degree-0 carry-forward nodes."""
    import ray.data as rd

    from searchengine_ray.stages.graph import label_propagation

    rng = np.random.default_rng(91)
    edges_df = pd.DataFrame({
        "src": rng.integers(0, 80, 600).astype(np.int64),
        "dst": rng.integers(10, 90, 600).astype(np.int64)})
    edges_df = (edges_df[edges_df.src != edges_df.dst]
                .drop_duplicates().reset_index(drop=True))
    ds = rd.from_pandas(edges_df).repartition(5)
    bc = (label_propagation(ds, num_nodes=90, rounds=3)
          .to_pandas().sort_values("node").reset_index(drop=True))
    dist = (label_propagation(ds, num_nodes=90, rounds=3,
                              broadcast_threshold=0)
            .to_pandas().sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(bc, dist)
    # never-a-dst sources (ids < 10) must keep their own label
    low = bc[bc["node"] < 10]
    assert (low["community"].to_numpy() == low["node"].to_numpy()).all()
