"""Exact edit-distance-threshold self-join (Ed-Join family — Gravano et
al. VLDB'01 q-gram filtering, Xiao/Wang/Lin VLDB'08 prefix filtering) —
the CHARACTER-level similarity family next to the token-set ones
(``stages/dedup``): fuzzy title / entity-name matching for record linkage
over a 100-TB corpus.

Exactness argument (distinct q-gram sets, global rarity order):

* One edit operation destroys q-grams at <= q positions, so a gram in
  G(a) \\ G(b) must have had ALL its occurrences destroyed — hence
  |G(a) \\ G(b)| <= q*d for ed(a,b) <= d, and shared >= max(|Ga|,|Gb|)
  - q*d =: T.
* Prefix-filter theorem: order every gram set by one global total order
  (df asc, gram asc — rarest first); if shared >= T the first
  |G|-T+1 grams of each side intersect.  For the larger side that is
  exactly q*d+1; the smaller side needs |G_small|-T+1 <= q*d+1.  So a
  per-string prefix of min(|G|, q*d+1) rarest grams loses no pair —
  UNLESS both sides have |G| <= q*d (T <= 0, no shared-gram guarantee at
  all: "abc" vs "xyz" at d=3 share nothing).  Those gram-poor strings
  (length < ~q+q*d — degenerate titles at corpus scale) all emit one
  SENTINEL bucket row and are all-paired within it under the length
  filter; a gram-poor vs gram-rich pair needs shared >= |G_rich|-q*d >
  |G_poor| which is impossible, so it is correctly never a pair.
* Length filter |len(a)-len(b)| <= d is necessary for ed <= d.
* Survivors get the EXACT Levenshtein distance from a pair-vectorized
  DP, so filter bugs can only cost speed — a lost candidate costs
  recall, which the all-pairs SQL oracle (DuckDB ``levenshtein``) and
  the brute-force pytest both pin.

Distributed shape mirrors ``dedup.ppjoin_jaccard_pairs``: df by one
``pre_aggregate`` (vocab never broadcast), df attach + prefix selection +
pair generation + string attach all as co-shuffles; nothing corpus-scaled
touches the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset

_PAD = np.int64(-1)  # code-point pad; real code points are >= 0


def _codes(s: str) -> np.ndarray:
    """Unicode code points as int64 (DuckDB levenshtein is per-character;
    utf-32-le gives exact code points, vectorized)."""
    return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)


def levenshtein_batch(a_strs, b_strs) -> np.ndarray:
    """Exact Levenshtein for P string pairs, vectorized ACROSS pairs and
    across columns: the insertion recurrence D[i][j] = min(tmp[j],
    D[i][j-1]+1) unrolls to a prefix-min of (base[k]-k) + j, so each DP
    row is pure 2-D numpy and the only Python loop is over the <=
    max-length rows of the A side."""
    P = len(a_strs)
    if P == 0:
        return np.zeros(0, dtype=np.int64)
    ac = [_codes(s or "") for s in a_strs]
    bc = [_codes(s or "") for s in b_strs]
    la = np.fromiter((x.size for x in ac), dtype=np.int64, count=P)
    lb = np.fromiter((x.size for x in bc), dtype=np.int64, count=P)
    La, Lb = int(la.max()), int(lb.max())
    A = np.full((P, max(La, 1)), _PAD, dtype=np.int64)
    B = np.full((P, max(Lb, 1)), _PAD - 1, dtype=np.int64)  # never equal
    for p in range(P):
        if la[p]:
            A[p, :la[p]] = ac[p]
        if lb[p]:
            B[p, :lb[p]] = bc[p]
    cols = np.arange(Lb + 1, dtype=np.int64)
    prev = np.broadcast_to(cols, (P, Lb + 1)).copy()
    base = np.empty((P, Lb + 1), dtype=np.int64)
    for i in range(1, La + 1):
        ai = A[:, i - 1]
        sub = prev[:, :-1] + (B[:, :Lb] != ai[:, None])
        np.minimum(sub, prev[:, 1:] + 1, out=base[:, 1:])
        base[:, 0] = i
        # insertion cascade: cur[j] = min_{k<=j}(base[k] + (j-k))
        cur = np.minimum.accumulate(base - cols, axis=1) + cols
        alive = (i <= la)[:, None]
        prev = np.where(alive, cur, prev)
    return prev[np.arange(P), lb]


def _pack_grams(codes: np.ndarray, q: int) -> np.ndarray:
    """Distinct q-grams of one code-point array, packed losslessly into
    int64 (21 bits per code point, q <= 3; collision-free so the df order
    and bucket keys are exact)."""
    n = codes.size - q + 1
    if n <= 0:
        return np.zeros(0, dtype=np.int64)
    g = np.zeros(n, dtype=np.int64)
    for k in range(q):
        g = (g << 21) | codes[k:k + n]
    return np.unique(g)


def _explode_grams_batch(df: pd.DataFrame, q: int, qd: int) -> pd.DataFrame:
    """Distinct (doc_id, gram, l) rows for a batch of strings, array-built:
    one concatenated code array, segmented sliding-window gram packing,
    one lexsort + adjacent-dedupe for the per-doc distinct — the only
    per-row Python is the utf-32 encode.  Gram-poor docs (distinct grams
    <= q*d, including zero-gram shorties) append one sentinel (-1) row."""
    docs = df["doc_id"].to_numpy(dtype=np.int64)
    lv = df["l"].to_numpy(dtype=np.int64)
    codes = [_codes(s or "") for s in df["s"].to_numpy()]
    nd = len(codes)
    clens = np.fromiter((c.size for c in codes), dtype=np.int64, count=nd)
    flat = (np.concatenate(codes) if nd and clens.sum()
            else np.zeros(0, dtype=np.int64))
    ng = np.maximum(clens - q + 1, 0)
    starts = np.concatenate(([0], np.cumsum(clens)[:-1])) if nd else clens
    # segmented arange: global start positions of every gram window
    pos = (np.repeat(starts, ng)
           + (np.arange(int(ng.sum()), dtype=np.int64)
              - np.repeat(np.concatenate(([0], np.cumsum(ng)[:-1])), ng)))
    g = np.zeros(pos.size, dtype=np.int64)
    for k in range(q):
        g = (g << 21) | flat[pos + k]
    doc_idx = np.repeat(np.arange(nd, dtype=np.int64), ng)
    # distinct (doc, gram): lexsort + adjacent-dedupe
    order = np.lexsort((g, doc_idx))
    di, gs = doc_idx[order], g[order]
    keep = np.empty(di.size, dtype=bool)
    if di.size:
        keep[0] = True
        keep[1:] = (di[1:] != di[:-1]) | (gs[1:] != gs[:-1])
    di, gs = di[keep], gs[keep]
    n_distinct = np.bincount(di, minlength=nd).astype(np.int64)
    poor = np.flatnonzero(n_distinct <= qd)
    out_doc = np.concatenate([docs[di], docs[poor]])
    out_g = np.concatenate([gs, np.full(poor.size, -1, dtype=np.int64)])
    out_l = np.concatenate([lv[di], lv[poor]])
    return pd.DataFrame({"doc_id": out_doc, "g": out_g, "l": out_l})


def edit_distance_pairs(
    ds: Dataset, max_dist: int, q: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
    prefix_chars: int | None = None,
) -> Dataset:
    """All (id_a < id_b, dist) pairs with Levenshtein distance <= max_dist
    between the (optionally ``prefix_chars``-truncated) strings.  Exact —
    see module docstring for the pruning-bound argument."""
    if q > 3:
        raise ValueError("q <= 3 (three 21-bit code points per int64 key)")
    from searchengine_ray.stages.relational import bucketed_apply, pre_aggregate

    qd = q * max_dist
    plen_cap = qd + 1

    def to_strings(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].astype(str)
        if prefix_chars is not None:
            s = s.str.slice(0, prefix_chars)
        return pd.DataFrame({"doc_id": df[id_col].to_numpy(dtype=np.int64),
                             "s": s.to_numpy(),
                             "l": s.str.len().to_numpy(dtype=np.int64)})

    strs = ds.map_batches(to_strings, batch_format="pandas").materialize()

    exploded = strs.map_batches(
        lambda df: _explode_grams_batch(df, q, qd),
        batch_format="pandas").materialize()
    dfc = pre_aggregate(
        exploded.map_batches(lambda df: df[df["g"] != -1][["g"]],
                             batch_format="pandas"),
        ["g"], {"df": (None, "count")})

    cols = ["g", "doc_id", "l", "df", "side"]

    def tag_rows(df: pd.DataFrame) -> pd.DataFrame:
        z = np.zeros(len(df), dtype=np.int64)
        return pd.DataFrame({"g": df["g"].to_numpy(dtype=np.int64),
                             "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
                             "l": df["l"].to_numpy(dtype=np.int64),
                             "df": z, "side": z})[cols]

    def tag_df(df: pd.DataFrame) -> pd.DataFrame:
        z = np.zeros(len(df), dtype=np.int64)
        return pd.DataFrame({"g": df["g"].to_numpy(dtype=np.int64),
                             "doc_id": z, "l": z,
                             "df": df["df"].to_numpy(dtype=np.int64),
                             "side": np.full(len(df), -1, dtype=np.int64)})[cols]

    both = (exploded.map_batches(tag_rows, batch_format="pandas")
            .union(dfc.map_batches(tag_df, batch_format="pandas")))

    def attach_df(gdf: pd.DataFrame) -> pd.DataFrame:
        side = gdf["side"].to_numpy()
        rows = gdf[side == 0]
        dft = gdf[side == -1]
        out = rows[["doc_id", "g", "l"]].merge(
            dft[["g", "df"]], on="g", how="left")
        # sentinel gram (-1) has no df row; df 0 keeps it but rank order
        # within a doc is irrelevant for it (it is always kept below)
        out["df"] = out["df"].fillna(0).astype(np.int64)
        return out[["doc_id", "g", "l", "df"]]

    withdf = bucketed_apply(both, ["g"], attach_df)

    def prefix_bucket(gdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                              "g": pd.Series([], dtype=np.int64),
                              "l": pd.Series([], dtype=np.int64)})
        if not len(gdf):
            return empty
        doc = gdf["doc_id"].to_numpy(dtype=np.int64)
        dfv = gdf["df"].to_numpy(dtype=np.int64)
        gv = gdf["g"].to_numpy(dtype=np.int64)
        lv = gdf["l"].to_numpy(dtype=np.int64)
        order = np.lexsort((gv, dfv, doc))
        doc_s, g_s, l_s = doc[order], gv[order], lv[order]
        new = np.empty(doc_s.size, dtype=bool)
        new[0] = True
        np.not_equal(doc_s[1:], doc_s[:-1], out=new[1:])
        seg_start = np.flatnonzero(new)
        seg_len = np.diff(np.append(seg_start, doc_s.size))
        rank = np.arange(doc_s.size, dtype=np.int64) - np.repeat(seg_start,
                                                                 seg_len)
        keep = (rank < plen_cap) | (g_s == -1)
        return pd.DataFrame({"doc_id": doc_s[keep], "g": g_s[keep],
                             "l": l_s[keep]})

    prefix = bucketed_apply(withdf, ["doc_id"], prefix_bucket)

    def pairs_bucket(gdf: pd.DataFrame) -> pd.DataFrame:
        m = gdf.merge(gdf, on="g", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        ok = np.abs(m["l_a"].to_numpy(dtype=np.int64)
                    - m["l_b"].to_numpy(dtype=np.int64)) <= max_dist
        m = m[ok]
        return pd.DataFrame({"doc_a": m["doc_id_a"].to_numpy(dtype=np.int64),
                             "doc_b": m["doc_id_b"].to_numpy(dtype=np.int64)})

    pair_rows = bucketed_apply(prefix, ["g"], pairs_bucket)
    cand = pre_aggregate(pair_rows, ["doc_a", "doc_b"],
                         {"hits": (None, "count")})
    return _pair_edit_verify(cand, strs, max_dist)


def _pair_edit_verify(cand: Dataset, strs: Dataset, max_dist: int) -> Dataset:
    """Attach both member strings to each candidate pair (two co-shuffles,
    the ``_pair_jaccard_coshuffle`` shape) and keep exact dist <= max_dist
    via the vectorized DP kernel.  Strings cross the wire O(candidates)."""
    from searchengine_ray.stages.relational import bucketed_apply

    cols = ["doc_id", "pair_a", "pair_b", "side", "s"]

    def members(df: pd.DataFrame) -> pd.DataFrame:
        a = df["doc_a"].to_numpy(dtype=np.int64)
        b = df["doc_b"].to_numpy(dtype=np.int64)
        k = len(df)
        return pd.DataFrame({"doc_id": np.concatenate([a, b]),
                             "pair_a": np.tile(a, 2), "pair_b": np.tile(b, 2),
                             "side": np.repeat(np.array([0, 1], np.int64), k),
                             "s": np.full(2 * k, "", dtype=object)})[cols]

    def widen_s(df: pd.DataFrame) -> pd.DataFrame:
        z = np.zeros(len(df), dtype=np.int64)
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(dtype=np.int64),
                             "pair_a": z, "pair_b": z,
                             "side": np.full(len(df), -1, dtype=np.int64),
                             "s": df["s"].to_numpy()})[cols]

    both = (cand.map_batches(members, batch_format="pandas")
            .union(strs.map_batches(widen_s, batch_format="pandas")))

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        side = g["side"].to_numpy()
        mem = g[side >= 0].drop_duplicates(["pair_a", "pair_b", "side"])
        st = g[side < 0]
        out = mem[["doc_id", "pair_a", "pair_b", "side"]].merge(
            st[["doc_id", "s"]], on="doc_id")
        return out[["pair_a", "pair_b", "side", "s"]]

    attached = bucketed_apply(both, ["doc_id"], attach)

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                              "doc_b": pd.Series([], dtype=np.int64),
                              "dist": pd.Series([], dtype=np.int64)})
        if not len(g):
            return empty
        side = g["side"].to_numpy()
        s0 = g[side == 0].drop_duplicates(["pair_a", "pair_b"])
        s1 = g[side == 1].drop_duplicates(["pair_a", "pair_b"])
        m = s0[["pair_a", "pair_b", "s"]].merge(
            s1[["pair_a", "pair_b", "s"]], on=["pair_a", "pair_b"],
            suffixes=("_a", "_b"))
        if not len(m):
            return empty
        dist = levenshtein_batch(m["s_a"].tolist(), m["s_b"].tolist())
        keep = dist <= max_dist
        return pd.DataFrame({"doc_a": m["pair_a"].to_numpy(dtype=np.int64)[keep],
                             "doc_b": m["pair_b"].to_numpy(dtype=np.int64)[keep],
                             "dist": dist[keep]})

    return bucketed_apply(attached, ["pair_a", "pair_b"], resolve)
