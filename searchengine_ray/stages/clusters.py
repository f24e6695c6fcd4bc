"""Near-dup cluster resolution: pairs → connected components → survivors.

Every near-dup family (minhash / simhash / phash / n-gram / embedding)
emits (id_a, id_b) PAIRS; a training-data dedup pass consumes CLUSTERS —
the transitive closure of the pair graph — and keeps one survivor per
cluster.  The reference's sequential gate resolves this implicitly by
arrival order (reference ngrams.py:118-139: the accepted set defines the
survivors); this module is the corpus-side distributed equivalent.

Scale shape: the pair graph is output-scale (O(duplicate pairs)) —
orders of magnitude smaller than the corpus but still far too large for
one process — so labels live in a Dataset and every round is two
all-to-alls over tiny (node, label) rows:

  1. one co-shuffle keyed on the notifying node that serves, in the same
     bucket pass, BOTH min-label propagation along edges AND pointer
     jumping (label[u] → label[label[u]]);
  2. one ``pre_aggregate`` min-merge of the candidate labels per node.

Min-label propagation alone converges in O(diameter) rounds; the fused
pointer-jumping step shortcuts chains so convergence is O(log n) on any
graph — and near-dup clusters are near-cliques, so 2-3 rounds in
practice.  Each round materializes the label table (bounded by
pair-graph NODES, never corpus rows) to keep lineage flat, and the
driver sees only O(1) scalars (the convergence fingerprint).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset

from searchengine_ray.stages.relational import (
    bucketed_apply, hash_join, pre_aggregate)


def _label_fingerprint(labels: Dataset) -> int:
    """Order-independent fingerprint of the (node, label) multiset.

    Labels are min-monotone (each node's label only ever decreases), so
    the multiset changes iff any label changed — a stable per-row hash
    summed mod 2^64 detects that without shipping the table anywhere."""

    def part(df: pd.DataFrame) -> pd.DataFrame:
        h = (pd.util.hash_pandas_object(df["node"], index=False,
                                        categorize=False).to_numpy(np.uint64)
             ^ pd.util.hash_pandas_object(df["label"], index=False,
                                          categorize=False).to_numpy(np.uint64))
        # int64 view: uint64 reductions hit this host's slow path
        return pd.DataFrame({"s": [int(h.view(np.int64).sum())]})

    parts = labels.map_batches(part, batch_format="pandas").to_pandas()
    return int(parts["s"].sum()) & ((1 << 64) - 1)


# Below this pair count the driver resolves components directly with a
# union-find: every label round costs two all-to-alls of fixed (~1s
# single-node) machinery, so a tiny pair graph pays seconds of shuffle
# latency for microseconds of work.  The same size-routing discipline as
# the crawl's driver/distributed resolve (`driver_fp_threshold`): the
# driver pull is bounded by the threshold — at most ~200k×(2 ids) rows —
# and big pair graphs take the distributed path unchanged.
DRIVER_CC_MAX_PAIRS = 200_000


def _driver_components(pdf: pd.DataFrame, id_a: str, id_b: str) -> pd.DataFrame:
    """Union-find with path halving; cluster_id = min node per component.

    Same fixed point as the distributed path (the min-label fixed point is
    unique), asserted by tests/test_clusters.py on both routes."""
    both = pd.concat([pdf[id_a], pdf[id_b]], ignore_index=True)
    codes, uniques = pd.factorize(both)
    k = len(pdf)
    parent = np.arange(len(uniques), dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for a, b in zip(codes[:k], codes[k:]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    roots = np.fromiter((find(i) for i in range(len(uniques))),
                        dtype=np.int64, count=len(uniques))
    lab = pd.DataFrame({"node": np.asarray(uniques), "root": roots})
    lab["cluster_id"] = lab.groupby("root")["node"].transform("min")
    return lab[["node", "cluster_id"]]


def connected_components(
    pairs: Dataset, id_a: str = "doc_a", id_b: str = "doc_b",
    max_rounds: int = 50,
    driver_threshold: int = DRIVER_CC_MAX_PAIRS,
) -> Dataset:
    """(node, cluster_id) for every node in ``pairs``; ``cluster_id`` is the
    minimum node id of its connected component.  Node ids may be any
    orderable hashable dtype (int64 doc ids, string image URLs).

    Deterministic: the fixed point of min-label propagation is unique, so
    the result is independent of round count, partitioning, schedule —
    and of which route (driver union-find below ``driver_threshold``
    pairs, distributed label propagation above) resolved it."""
    import ray.data as rd

    pairs = pairs.materialize()  # pair-scale; consumed 2-3 times below
    if pairs.count() <= driver_threshold:
        pdf = pairs.to_pandas()  # bounded by the threshold
        if not len(pdf):
            return pairs.map_batches(
                lambda df: pd.DataFrame({"node": df[id_a],
                                         "cluster_id": df[id_a]}),
                batch_format="pandas")
        return rd.from_pandas(_driver_components(pdf, id_a, id_b))
    # symmetric edge list: row (key=u, node=v) means "u notifies v"
    def sym(df: pd.DataFrame) -> pd.DataFrame:
        a = df[id_a].to_numpy()
        b = df[id_b].to_numpy()
        return pd.DataFrame({"key": np.concatenate([a, b]),
                             "node": np.concatenate([b, a])})

    edges = pairs.map_batches(sym, batch_format="pandas").materialize()

    # initial labels: min(self, neighbors) — one aggregate instead of a
    # whole propagation round (each edge row (key→node) contributes its
    # source as a candidate label for the destination, plus the self row)
    def init_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": np.concatenate([df["node"].to_numpy(),
                                    df["node"].to_numpy()]),
            "label": np.concatenate([df["node"].to_numpy(),
                                     df["key"].to_numpy()])})

    labels = pre_aggregate(
        edges.map_batches(init_rows, batch_format="pandas"),
        ["node"], {"label": ("label", "min")}).materialize()

    fp = _label_fingerprint(labels)
    for _ in range(max_rounds):
        # tagged union keyed on the node whose label is being read:
        #   typ 0 (key=node):        carries the label — and keeps its own
        #   typ 1 (key=u, node=v):   edge — v reads label[u]
        #   typ 2 (key=label[u], node=u): pointer jump — u reads label[label[u]]
        # typ 1/2 rows carry a placeholder in `label` (same dtype; ignored).
        lab_rows = labels.map_batches(
            lambda df: df.assign(key=df["node"], typ=np.int8(0))[
                ["key", "node", "label", "typ"]],
            batch_format="pandas")
        ptr_rows = labels.map_batches(
            lambda df: pd.DataFrame({"key": df["label"], "node": df["node"],
                                     "label": df["node"],
                                     "typ": np.full(len(df), 2, np.int8)}),
            batch_format="pandas")
        edge_rows = edges.map_batches(
            lambda df: pd.DataFrame({"key": df["key"], "node": df["node"],
                                     "label": df["node"],
                                     "typ": np.full(len(df), 1, np.int8)}),
            batch_format="pandas")

        def resolve(g: pd.DataFrame) -> pd.DataFrame:
            typ = g["typ"].to_numpy()
            holders = g[typ == 0][["key", "label"]]
            readers = g[typ != 0][["key", "node"]]
            fwd = readers.merge(holders, on="key")[["node", "label"]]
            own = g[typ == 0][["node", "label"]]
            return pd.concat([own, fwd], ignore_index=True)

        cands = bucketed_apply(lab_rows.union(ptr_rows).union(edge_rows),
                               ["key"], resolve)
        labels = pre_aggregate(cands, ["node"],
                               {"label": ("label", "min")}).materialize()
        new_fp = _label_fingerprint(labels)
        if new_fp == fp:
            break
        fp = new_fp
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds")

    def rename(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"label": "cluster_id"})

    return labels.map_batches(rename, batch_format="pandas")


def attach_clusters(
    ds: Dataset, components: Dataset, id_col: str,
    out_col: str = "cluster_id",
) -> Dataset:
    """LEFT-join the corpus to the (pair-graph-scale) component labels;
    rows outside any pair are singleton clusters labeled by their own id.
    Both sides co-shuffle once (``hash_join`` — neither broadcasts: the
    component table is duplicate-scale, unbounded at 100 TB)."""

    def comp_cols(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({id_col: df["node"], out_col: df["cluster_id"]})

    comps = components.map_batches(comp_cols, batch_format="pandas")
    joined = hash_join(ds, comps, on=id_col, how="left")

    def fill(df: pd.DataFrame) -> pd.DataFrame:
        # singleton: cluster is the row's own id (restores the id dtype the
        # left join's null-widening may have degraded)
        c = df[out_col].where(df[out_col].notna(), df[id_col])
        df[out_col] = c.astype(df[id_col].dtype)
        return df

    return joined.map_batches(fill, batch_format="pandas")


def cluster_survivors(
    ds: Dataset, components: Dataset, id_col: str,
    better: list[tuple[str, bool]],
) -> Dataset:
    """Keep-best survivor per cluster over the FULL corpus (singletons keep
    themselves).  ``better``: [(col, ascending)] sort spec — first row per
    cluster after the sort survives; always tie-breaks on ``id_col`` asc.
    Output: the surviving rows plus (cluster_id, n_members).

    One attach join + one co-shuffle on cluster_id; inside each bucket a
    single vectorized sort + drop_duplicates + size-merge serves every
    cluster at once (no per-cluster Python)."""
    attached = attach_clusters(ds, components, id_col)
    cols = [c for c, _ in better]
    asc = [a for _, a in better]

    def keep_best(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby("cluster_id", sort=False).size().rename("n_members")
        best = (g.sort_values(cols + [id_col], ascending=asc + [True],
                              kind="mergesort")
                .drop_duplicates("cluster_id", keep="first"))
        out = best.merge(sizes, left_on="cluster_id", right_index=True)
        out["n_members"] = out["n_members"].astype(np.int64)
        return out

    return bucketed_apply(attached, ["cluster_id"], keep_best)
