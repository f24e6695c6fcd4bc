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


def _pack_codes_matrix(strs, pad: int,
                       ws_key: str | None = None
                       ) -> tuple[np.ndarray, np.ndarray]:
    """(P, Lmax) int32 code-point matrix + lengths, fully vectorized:
    one utf-32 encode of the joined string, one masked scatter — no
    per-row Python fill (the per-pair loop was the measured bottleneck
    of the full kernel at 10^5+ pairs).  ``ws_key`` reuses a per-process
    buffer."""
    P = len(strs)
    lens = np.fromiter((len(s or "") for s in strs), dtype=np.int64,
                       count=P)
    L = int(lens.max()) if P else 0
    shape = (P, max(L, 1))
    if ws_key is None:
        M = np.full(shape, pad, dtype=np.int32)
    else:
        M = _edws(ws_key, shape, np.int32)
        M[:] = pad
    if lens.sum():
        flat = np.frombuffer("".join(s or "" for s in strs)
                             .encode("utf-32-le"), dtype=np.uint32)
        M[np.arange(shape[1])[None, :] < lens[:, None]] = \
            flat.astype(np.int32)
    return M, lens


_BINF = np.int32(1 << 20)  # band sentinel: larger than any real distance

# per-worker-process reusable band buffers (the minhash/kmeans workspace
# discipline — this host first-touch page-faults fresh allocations at
# ~8 MB/s, and the band loop would otherwise allocate P×W per row)
_EDWS: dict = {}


def _edws(key: str, shape: tuple, dtype) -> np.ndarray:
    buf = _EDWS.get(key)
    if (buf is None or buf.shape[0] < shape[0] or buf.shape[1:] != shape[1:]
            or buf.dtype != dtype):
        buf = np.empty(shape, dtype=dtype)
        _EDWS[key] = buf
    return buf[:shape[0]]


def levenshtein_batch_banded(a_strs, b_strs, k: int) -> np.ndarray:
    """Ukkonen-banded Levenshtein for P pairs with threshold ``k``:
    EXACT wherever the true distance is <= k, and returns a value > k
    (capped at k+1) otherwise — the verify contract, where only
    ``dist <= k`` survivors are emitted.  Pinned against the full DP by
    test.

    Vectorized across pairs × the 2k+1 band: per row one contiguous
    (P, 2k+1) slice of the sentinel-padded B matrix, the same
    prefix-min insertion cascade as the full kernel but over band-local
    columns, int32 throughout — per-row work drops from P×len(b) to
    P×(2k+1) cells and the pack is scatter-vectorized."""
    P = len(a_strs)
    out = np.full(P, k + 1, dtype=np.int64)
    if P == 0:
        return out
    A, la = _pack_codes_matrix(a_strs, _PAD, ws_key="bd_A")
    B, lb = _pack_codes_matrix(b_strs, _PAD - 1, ws_key="bd_B")
    ok = np.abs(la - lb) <= k
    if not ok.any():
        return out
    W = 2 * k + 1
    La = int(la.max())
    Lb = B.shape[1]
    # pad B with k+1 sentinel columns both sides: row i reads the
    # contiguous slice BP[:, i : i+W] = b chars at j-1 for j = i-k..i+k
    BP = _edws("bd_BP", (P, Lb + 2 * k + 2), np.int32)
    BP[:] = _PAD - 1
    BP[:, k + 1:k + 1 + Lb] = B
    tcols = np.arange(W, dtype=np.int32)
    # row-0 band: prev[t] = D[0][j] = j at j = t-k, INF where j < 0
    j0 = tcols - np.int32(k)
    prev = _edws("bd_prev", (P, W), np.int32)
    prev[:] = np.where(j0 >= 0, j0, _BINF)[None, :]
    base = _edws("bd_base", (P, W), np.int32)
    tmp = _edws("bd_tmp", (P, W), np.int32)
    for i in range(1, La + 1):
        bc = BP[:, i:i + W]
        np.add(prev, (bc != A[:, i - 1][:, None]), out=base,
               casting="unsafe")                      # substitution
        np.add(prev[:, 1:], np.int32(1), out=tmp[:, 1:])
        np.minimum(base[:, :-1], tmp[:, 1:], out=base[:, :-1])  # deletion
        if i <= k:  # column j=0 sits in the band at t=k-i: D[i][0] = i
            base[:, k - i] = np.minimum(base[:, k - i], np.int32(i))
        # insertion cascade within the band (left-to-right prefix min)
        np.subtract(base, tcols, out=tmp)
        np.minimum.accumulate(tmp, axis=1, out=tmp)
        np.add(tmp, tcols, out=tmp)
        np.minimum(tmp, _BINF, out=tmp)
        np.copyto(prev, tmp, where=(i <= la)[:, None])
    t_ans = (lb - la + k).astype(np.int64)
    sel = ok & (t_ans >= 0) & (t_ans < W)
    out[sel] = np.minimum(prev[np.flatnonzero(sel), t_ans[sel]],
                          np.int64(k + 1))
    return out


_DP_CHUNK = 200_000  # pairs per banded-DP call: keeps the per-worker
# band buffers ~7 MB so the one-time first-touch fault cost (this host:
# ~8 MB/s) is paid once and every later call reuses the same pages


def banded_dist_chunked(a_strs, b_strs, k: int,
                        chunk: int = _DP_CHUNK) -> np.ndarray:
    """``levenshtein_batch_banded`` in bounded slices — same output."""
    P = len(a_strs)
    if P <= chunk:
        return levenshtein_batch_banded(a_strs, b_strs, k)
    out = np.empty(P, dtype=np.int64)
    for c0 in range(0, P, chunk):
        out[c0:c0 + chunk] = levenshtein_batch_banded(
            a_strs[c0:c0 + chunk], b_strs[c0:c0 + chunk], k)
    return out


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


# prefix filtering is routed out when its estimated candidate mass is
# within this fraction of all-pairs: on a gram-poor alphabet (synthetic
# or short-title corpora) every "rare" gram is shared corpus-wide, the
# filter prunes nothing, and the blocked brute force does the SAME
# Θ(n²) verifies at kernel speed without generating/shuffling the
# duplicated candidate rows (measured 84 → ~11 s at sf0.1).
DENSE_ROUTE_RHO = 0.2


def _dense_blocked_pairs(
    strs: Dataset, max_dist: int, chunk_rows: int = 256,
) -> Dataset:
    """Exact all-pairs edit join via triangle blocking: strings hash into
    K = ceil(n/chunk) chunks, every row replicates to the K pair-buckets
    containing its chunk (n×K rows — √-scale replication), each (i, j)
    bucket runs the length filter + banded DP over its ≤ chunk² grid.
    Each unordered pair lives in exactly one bucket — no dedup pass."""
    from searchengine_ray.stages.relational import bucketed_map_groups

    n = strs.count()
    k_chunks = max(1, -(-n // chunk_rows))

    def replicate(df: pd.DataFrame) -> pd.DataFrame:
        doc = df["doc_id"].to_numpy(np.int64)
        c = ((doc * np.int64(2654435761)) % np.int64(2 ** 31)) % k_chunks
        m = len(df)
        jj = np.tile(np.arange(k_chunks, dtype=np.int64), m)
        cc = np.repeat(c, k_chunks)
        lo = np.minimum(cc, jj)
        hi = np.maximum(cc, jj)
        return pd.DataFrame({
            "pb": lo * k_chunks + hi,
            "ch": cc,
            "doc_id": np.repeat(doc, k_chunks),
            "s": np.repeat(df["s"].to_numpy(), k_chunks),
            "l": np.repeat(df["l"].to_numpy(np.int64), k_chunks)})

    empty = pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                          "doc_b": pd.Series([], dtype=np.int64),
                          "dist": pd.Series([], dtype=np.int64)})

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return empty.copy()
        pb = int(g["pb"].iloc[0])
        i, j = divmod(pb, k_chunks)
        if i == j:
            m = g
            ai, bi = np.triu_indices(len(m), k=1)
        else:
            ga = g[g["ch"].to_numpy() == i]
            gb = g[g["ch"].to_numpy() == j]
            if not len(ga) or not len(gb):
                return empty.copy()
            na, nb = len(ga), len(gb)
            ai = np.repeat(np.arange(na), nb)
            bi = np.tile(np.arange(nb), na)
        if not ai.size:
            return empty.copy()
        left = g if i == j else ga
        right = g if i == j else gb
        la = left["l"].to_numpy(np.int64)[ai]
        lb = right["l"].to_numpy(np.int64)[bi]
        keep = np.abs(la - lb) <= max_dist
        ai, bi = ai[keep], bi[keep]
        if not ai.size:
            return empty.copy()
        da = left["doc_id"].to_numpy(np.int64)[ai]
        db = right["doc_id"].to_numpy(np.int64)[bi]
        dist = banded_dist_chunked(
            left["s"].to_numpy()[ai].tolist(),
            right["s"].to_numpy()[bi].tolist(), max_dist)
        ok = dist <= max_dist
        da, db, dist = da[ok], db[ok], dist[ok]
        return pd.DataFrame({"doc_a": np.minimum(da, db),
                             "doc_b": np.maximum(da, db),
                             "dist": dist})

    reps = strs.map_batches(replicate, batch_format="pandas")
    return bucketed_map_groups(reps, ["pb"], per_group)


def edit_distance_pairs(
    ds: Dataset, max_dist: int, q: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
    prefix_chars: int | None = None,
    dense_route_rho: float = DENSE_ROUTE_RHO,
) -> Dataset:
    """All (id_a < id_b, dist) pairs with Levenshtein distance <= max_dist
    between the (optionally ``prefix_chars``-truncated) strings.  Exact —
    see module docstring for the pruning-bound argument.

    Size-routed (the skew-join discipline): after the df pre-aggregate,
    an O(blocks)-driver-rows pass estimates the prefix filter's candidate
    mass (Σ(df·p)²/2 with p = prefix share of the average gram set); when
    that is within ``dense_route_rho`` of all-pairs the filter cannot pay
    for its candidate shuffles and the blocked brute force runs instead —
    same output, no recall dependence either way (both routes end in the
    same exact verify kernel)."""
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
        ["g"], {"df": (None, "count")}).materialize()

    # selectivity estimate from per-batch scalar partials (O(blocks)
    # driver rows; the df table itself never lands on the driver)
    n_docs = strs.count()
    gram_rows = exploded.count()

    def df2_part(df: pd.DataFrame) -> pd.DataFrame:
        if "df" not in df.columns or not len(df):
            return pd.DataFrame({"s2": pd.Series([], dtype=np.float64)})
        v = df["df"].to_numpy(np.float64)
        return pd.DataFrame({"s2": [float(v @ v)]})

    sum_df2 = float(dfc.map_batches(df2_part, batch_format="pandas")
                    .to_pandas()["s2"].sum())
    avg_grams = max(gram_rows / max(n_docs, 1), 1.0)
    p_pref = min(1.0, plen_cap / avg_grams)
    cand_est = sum_df2 * p_pref * p_pref / 2.0
    if n_docs > 1 and cand_est >= (dense_route_rho
                                   * n_docs * (n_docs - 1) / 2.0):
        return _dense_blocked_pairs(strs, max_dist)

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
        # banded kernel: exact for every dist <= max_dist (the only
        # survivors), > max_dist pairs just need to be dropped
        dist = banded_dist_chunked(m["s_a"].tolist(),
                                   m["s_b"].tolist(), max_dist)
        keep = dist <= max_dist
        return pd.DataFrame({"doc_a": m["pair_a"].to_numpy(dtype=np.int64)[keep],
                             "doc_b": m["pair_b"].to_numpy(dtype=np.int64)[keep],
                             "dist": dist[keep]})

    return bucketed_apply(attached, ["pair_a", "pair_b"], resolve)


def linkage_best_match(
    queries: "Dataset", registry: "Dataset", max_dist: int,
    block_chars: int = 4,
    q_id: str = "query_id", q_text: str = "q_text",
    r_id: str = "reg_id", r_text: str = "r_text",
) -> "Dataset":
    """Record linkage (entity resolution): each query record's BEST
    registry match under a blocked exact-Levenshtein score — the
    block → score → resolve workflow (Fellegi–Sunter shape with a
    deterministic distance score).

    Blocking is PART of the semantics (as in every production ER
    system): candidates are only pairs sharing the first
    ``block_chars`` characters — callers pick a prefix their dirt model
    preserves, and the oracle mirrors the same block join.  Output
    (query_id, match_id, dist): the minimum-distance registry row with
    dist <= max_dist, ties resolved to the smallest registry id;
    unmatched queries are absent.

    Scale shape: both sides tag and co-shuffle ONCE on the block key
    (``bucketed_apply``); per bucket one pandas merge explodes each
    block's query×registry candidates and ONE ``levenshtein_batch_banded``
    call scores every candidate in the bucket (exact wherever
    dist <= k, the verify contract), then keep-best is a vectorized
    sort + grouped-head.  Candidate volume is Σ_block |Q_b|·|R_b| — the
    documented blocking assumption; a degenerate block (shared prefix
    across the corpus) should be fixed by a longer/compound block key,
    not chunked here."""
    import pandas as pd

    from searchengine_ray.stages.relational import bucketed_apply

    def tag_q(df: pd.DataFrame) -> pd.DataFrame:
        t = df[q_text].astype(str)
        return pd.DataFrame({
            "bk": t.str.slice(0, block_chars),
            "qid": df[q_id].to_numpy(np.int64),
            "qt": t, "side": np.int8(0)})

    def tag_r(df: pd.DataFrame) -> pd.DataFrame:
        t = df[r_text].astype(str)
        return pd.DataFrame({
            "bk": t.str.slice(0, block_chars),
            "qid": df[r_id].to_numpy(np.int64),
            "qt": t, "side": np.int8(1)})

    both = (queries.map_batches(tag_q, batch_format="pandas")
            .union(registry.map_batches(tag_r, batch_format="pandas")))

    empty = pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                          "match_id": pd.Series([], dtype=np.int64),
                          "dist": pd.Series([], dtype=np.int64)})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        qs = g[g["side"] == 0]
        rs = g[g["side"] == 1]
        if not len(qs) or not len(rs):
            return empty.copy()
        cand = qs[["bk", "qid", "qt"]].merge(
            rs[["bk", "qid", "qt"]].rename(
                columns={"qid": "rid", "qt": "rt"}), on="bk")
        if not len(cand):
            return empty.copy()
        d = levenshtein_batch_banded(cand["qt"].tolist(),
                                     cand["rt"].tolist(), max_dist)
        cand = cand.assign(dist=d)[d <= max_dist]
        if not len(cand):
            return empty.copy()
        best = (cand.sort_values(["qid", "dist", "rid"], kind="mergesort")
                .groupby("qid", sort=False).head(1))
        return pd.DataFrame({
            "query_id": best["qid"].to_numpy(np.int64),
            "match_id": best["rid"].to_numpy(np.int64),
            "dist": best["dist"].to_numpy(np.int64)})

    return bucketed_apply(both, ["bk"], per_bucket)
