"""Scale evidence for the round-4 close operators: per-source boilerplate
removal and the seeded deterministic global shuffle.

Deterministic synthetic corpus built in-Dataset (no disk fixture needed),
one quiet run; prints ONE JSON line.  Run from /root/repo:

    python scripts/scale_evidence_r4e.py
    GRAFT_ONLY=shuffle GRAFT_SHUFFLE_N=5000000 python scripts/scale_evidence_r4e.py

What the numbers evidence:
- boiler: detect+strip over N docs (~46 tokens each, 1000 sources, the
  60/20 planted furniture).  The boilerplate SET must stay tiny (≤ a few
  lines × sources — it is the broadcast side), the detect all-to-all
  carries only (source, line_hash) partials, and docs never shuffle — so
  docs/s should hold as N grows and driver memory stays O(sources).
- shuffle: value-based global rank over N ids.  The driver sees exactly
  256 prefix-group counts whatever N is; the single co-shuffle carries
  (doc_id, 14 hash chars)/row.  The sha256-per-id is the documented cost
  floor shared with hash_split (embarrassingly parallel, map-only).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

ONLY = set(os.environ.get("GRAFT_ONLY", "boiler,shuffle,triangle").split(","))
BOILER_N = int(os.environ.get("GRAFT_BOILER_N", "400000"))
SHUFFLE_N = int(os.environ.get("GRAFT_SHUFFLE_N", "2000000"))
TRI_E = int(os.environ.get("GRAFT_TRI_E", "2000000"))
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

out: dict = {"metric": "scale_evidence_r4e", "num_cpus": NUM_CPUS}


def _synth_docs(n: int, n_sources: int = 997):
    # 997 (not 1000): docs of one source step doc_id by n_sources, so the
    # 60/20 mix stride is n_sources*2654435761 mod 100 — it must be
    # coprime with 100 or the per-source promo rate degenerates to
    # all-or-nothing (1000 ≡ 0 mod 100 did exactly that, measured)
    """N planted-furniture docs as a Dataset (built distributed)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    def build(batch: pd.DataFrame) -> pd.DataFrame:
        did = batch["id"].to_numpy(np.int64)
        rng = np.random.default_rng(1234)
        vocab = np.array([f"w{i}" for i in range(400)], dtype=object)
        src = pd.Series((did % n_sources)).map(lambda s: f"s{s}")
        mix = (did * 2654435761) % 100
        rows = []
        for i, d in enumerate(did):
            parts = [f"{src.iloc[i]} home nav about contact search login help"]
            if mix[i] < 60:
                parts.append(f"{src.iloc[i]} promo banner subscribe "
                             f"newsletter deal offer click")
            body_rng = np.random.default_rng(d)
            parts.append(" ".join(body_rng.choice(vocab, size=30)))
            rows.append(" ".join(parts))
        _ = rng
        return pd.DataFrame({"doc_id": did, "source": src.to_numpy(),
                             "text": np.array(rows, dtype=object)})

    return (rd.range(n).map_batches(build, batch_format="pandas",
                                    batch_size=4096))


def _boiler() -> None:
    import ray

    from searchengine_ray.stages.boilerplate import (detect_boilerplate,
                                                     remove_boilerplate)

    ds = _synth_docs(BOILER_N).materialize()  # build cost excluded
    t0 = time.perf_counter()
    keys = detect_boilerplate(ds)
    t1 = time.perf_counter()
    res = remove_boilerplate(ds, ray.put(keys))
    import ray.data  # noqa: F401
    removed = res.map_batches(
        lambda df: df.assign(rm=df.n_lines - df.n_kept)[["rm"]],
        batch_format="pandas").sum("rm")
    t2 = time.perf_counter()
    out["boiler"] = {
        "docs": BOILER_N,
        "boiler_set_size": int(len(keys)),
        "detect_s": round(t1 - t0, 2),
        "strip_s": round(t2 - t1, 2),
        "docs_per_sec": round(BOILER_N / (t2 - t0), 1),
        "lines_removed": int(removed),
    }


def _shuffle() -> None:
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from searchengine_ray.stages.relational import (bucketed_apply,
                                                    pre_aggregate)
    from searchengine_ray.stages.sampling import hash_hex

    ds = rd.range(SHUFFLE_N).materialize()

    def key(df: pd.DataFrame) -> pd.DataFrame:
        k = hash_hex(df["id"].tolist(), "epoch0")
        return pd.DataFrame({
            "doc_id": df["id"].to_numpy(np.int64), "k": k,
            "g": np.fromiter((s[:2] for s in k), "<U2", count=len(k))})

    t0 = time.perf_counter()
    keyed = ds.map_batches(key, batch_format="pandas").materialize()
    per_g = pre_aggregate(keyed.select_columns(["g"]), ["g"],
                          {"n": (None, "count")}).to_pandas()
    per_g = per_g.sort_values("g")
    offsets = np.zeros(len(per_g), dtype=np.int64)
    np.cumsum(per_g["n"].to_numpy()[:-1], out=offsets[1:])
    off = dict(zip(per_g["g"], offsets))

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["g", "k", "doc_id"], kind="mergesort")
        r = g.groupby("g", sort=False).cumcount().to_numpy(np.int64)
        base = g["g"].map(off).to_numpy(np.int64)
        return pd.DataFrame({"doc_id": g["doc_id"].to_numpy(np.int64),
                             "pos": base + r})

    ranked = bucketed_apply(keyed, ["g"], rank_bucket)
    # permutation spot check without collecting N rows: min/max/count
    mn = ranked.min("pos")
    mx = ranked.max("pos")
    cnt = ranked.count()
    t1 = time.perf_counter()
    assert mn == 0 and mx == SHUFFLE_N - 1 and cnt == SHUFFLE_N
    out["shuffle"] = {
        "ids": SHUFFLE_N,
        "driver_group_rows": int(len(per_g)),
        "wall_s": round(t1 - t0, 2),
        "ids_per_sec": round(SHUFFLE_N / (t1 - t0), 1),
    }


def _triangle() -> None:
    """Hub-heavy graph: E edges where dst ~ Zipf-ish over sqrt(E) hubs
    plus random spokes.  WITHOUT degree ordering the hubs' Σdeg² wedge
    volume is ~E²/hubs; degree ordering keeps wedges near the arboricity
    bound, so the run should finish in seconds and wedge volume should be
    reported far below Σdeg²."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from searchengine_ray.stages.graph import triangle_count

    n_nodes = TRI_E // 4
    n_hubs = max(4, int(TRI_E ** 0.5) // 8)

    def build(batch: pd.DataFrame) -> pd.DataFrame:
        i = batch["id"].to_numpy(np.int64)
        rng = np.random.default_rng(7)
        _ = rng
        r1 = (i * 2654435761) % n_nodes
        # half the edges attach to a hub (id < n_hubs), half are random
        hub = (i * 40503) % n_hubs
        r2 = (i * 97 + 13) % n_nodes
        src = np.where(i % 2 == 0, r1, r2)
        dst = np.where(i % 2 == 0, hub, (r1 + r2 + 1) % n_nodes)
        return pd.DataFrame({"src": src, "dst": dst})

    edges = rd.range(TRI_E).map_batches(build, batch_format="pandas",
                                        batch_size=65536).materialize()
    t0 = time.perf_counter()
    tri = triangle_count(edges)
    t1 = time.perf_counter()
    out["triangle"] = {
        "edges": TRI_E, "nodes": n_nodes, "hubs": n_hubs,
        "triangles": tri, "wall_s": round(t1 - t0, 2),
        "edges_per_sec": round(TRI_E / (t1 - t0), 1),
    }


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    if "boiler" in ONLY:
        _boiler()
    if "shuffle" in ONLY:
        _shuffle()
    if "triangle" in ONLY:
        _triangle()
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
