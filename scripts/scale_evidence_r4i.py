"""Scale evidence for the round-4-final operator batch (script r4i).

Synthesizes multi-million-row inputs as streaming Datasets (range +
map_batches — nothing materializes on the driver) and measures each new
operator at ~100-1000× the sf0.1 gate scale, with a correctness
spot-check per section so the throughput numbers are for the REAL
semantics:

  python scripts/scale_evidence_r4i.py [section ...]

Sections: pivot bfs rank cms retention locf mv pca linkage
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import pandas as pd

import ray
import ray.data as rd


def _mk_events(n: int, users: int, blocks: int = 64):
    def gen(b: pd.DataFrame) -> pd.DataFrame:
        i = b["id"].to_numpy(np.int64)
        r = (i * np.int64(2654435761)) & np.int64((1 << 62) - 1)
        return pd.DataFrame({
            "event_id": i,
            "user_id": r % users,
            "cat": np.array(["a", "b", "c", "d", "e"])[(r >> 8) % 5],
            "v": ((r >> 16) % 100000).astype(np.float64) / 100.0,
            "ts_us": np.int64(1_700_000_000_000_000)
            + (r % np.int64(40 * 86400 * 1_000_000))})

    return (rd.range(n).repartition(blocks)
            .map_batches(gen, batch_format="pandas"))


def sec_pivot(n=10_000_000):
    from searchengine_ray.stages.relational import pivot_wide

    ds = _mk_events(n, users=200_000).materialize()
    t0 = time.perf_counter()
    out = pivot_wide(ds, "user_id", "cat", "v",
                     ["a", "b", "c", "d", "e"]).to_pandas()
    dt = time.perf_counter() - t0
    total = sum(out[f"{c}_cnt"].sum() for c in "abcde")
    assert total == n, (total, n)
    print(f"pivot_wide: {n} rows -> {len(out)} keys x 10 cols in {dt:.1f}s "
          f"({n/dt/1e6:.2f}M rows/s); total count preserved")


def sec_bfs(nodes=1_000_000, deg=3):
    from searchengine_ray.stages.graph import multi_source_bfs

    def gen(b: pd.DataFrame) -> pd.DataFrame:
        i = b["id"].to_numpy(np.int64)
        src = np.repeat(i, deg)
        j = np.tile(np.arange(1, deg + 1, dtype=np.int64), len(i))
        return pd.DataFrame({"src": src, "dst": (src * 31 + j) % nodes})

    edges = (rd.range(nodes).repartition(64)
             .map_batches(gen, batch_format="pandas")).materialize()
    seeds = np.arange(0, nodes, 9973, dtype=np.int64)
    t0 = time.perf_counter()
    got_b = multi_source_bfs(edges, seeds, max_hops=3).to_pandas()
    t_b = time.perf_counter() - t0
    t0 = time.perf_counter()
    got_d = multi_source_bfs(edges, seeds, max_hops=3,
                             force_distributed=True).to_pandas()
    t_d = time.perf_counter() - t0
    a = got_b.sort_values("node").reset_index(drop=True)
    b = got_d.sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    print(f"multi_source_bfs: {nodes} nodes x deg {deg}, {len(seeds)} seeds, "
          f"3 hops -> {len(a)} reached; broadcast {t_b:.1f}s, "
          f"distributed {t_d:.1f}s, routes identical")


def sec_rank(n=10_000_000):
    from searchengine_ray.stages.profile import value_rank_normalize

    ds = (_mk_events(n, users=1000)
          .map_batches(lambda df: df[["event_id", "v"]],
                       batch_format="pandas")).materialize()
    t0 = time.perf_counter()
    out = value_rank_normalize(ds, "v", "event_id")
    got = out.map_batches(
        lambda df: pd.DataFrame({"lo": [df["pct"].min()],
                                 "hi": [df["pct"].max()],
                                 "n": [len(df)]}),
        batch_format="pandas").to_pandas()
    dt = time.perf_counter() - t0
    assert int(got["n"].sum()) == n
    assert got["lo"].min() == 0.0 and got["hi"].max() == 1.0
    print(f"value_rank_normalize: {n} rows in {dt:.1f}s "
          f"({n/dt/1e6:.2f}M rows/s); pct spans [0,1], count preserved")


def sec_cms(n=20_000_000):
    from searchengine_ray.stages.sketches import (count_min_build,
                                                  count_min_query)

    def gen(b: pd.DataFrame) -> pd.DataFrame:
        i = b["id"].to_numpy(np.int64)
        r = (i * np.int64(0x9E3779B97F4A7C15 - (1 << 64))) & np.int64((1 << 62) - 1)
        # zipf-ish: 10 planted heavies own ~30% of the stream
        heavy = (r % 10).astype(np.int64)
        tail = 100 + (r % 3_000_000)
        return pd.DataFrame({"v": np.where(r % 100 < 30, heavy, tail)})

    ds = rd.range(n).repartition(64).map_batches(
        gen, batch_format="pandas").materialize()
    t0 = time.perf_counter()
    sk = count_min_build(ds, "v", depth=4, width=1 << 16)
    dt = time.perf_counter() - t0
    assert sk.sum() == 4 * n
    est = count_min_query(sk, pd.Series(np.arange(10, dtype=np.int64)))
    exp = n * 0.30 / 10
    assert (np.abs(est - exp) < exp * 0.15).all()
    print(f"count_min_build: {n} rows -> 4x65536 sketch in {dt:.1f}s "
          f"({n/dt/1e6:.2f}M rows/s); heavies within 15% of expectation")


def sec_retention(n=20_000_000):
    from searchengine_ray.stages.sessions import retention_cohorts

    ds = _mk_events(n, users=2_000_000).map_batches(
        lambda df: pd.DataFrame({
            "user_id": df["user_id"],
            "ts": pd.to_datetime(df["ts_us"], unit="us")}),
        batch_format="pandas").materialize()
    t0 = time.perf_counter()
    out = retention_cohorts(ds).to_pandas()
    dt = time.perf_counter() - t0
    assert (out["week_offset"] >= 0).all() and len(out) < 100
    print(f"retention_cohorts: {n} events / 2M users in {dt:.1f}s "
          f"({n/dt/1e6:.2f}M rows/s); {len(out)} matrix cells")


def sec_locf(n=10_000_000):
    from searchengine_ray.stages.sessions import locf_impute

    ds = _mk_events(n, users=500_000).map_batches(
        lambda df: pd.DataFrame({
            "event_id": df["event_id"], "user_id": df["user_id"],
            "ts": df["ts_us"],
            "v": np.where(df["event_id"] % 5 == 0, np.nan, df["v"])}),
        batch_format="pandas").materialize()
    t0 = time.perf_counter()
    cnt = locf_impute(ds, ts_col="ts").map_batches(
        lambda df: pd.DataFrame({"n": [len(df)],
                                 "nan": [df["v_filled"].isna().sum()]}),
        batch_format="pandas").to_pandas()
    dt = time.perf_counter() - t0
    assert int(cnt["n"].sum()) == n and int(cnt["nan"].sum()) == 0
    print(f"locf_impute: {n} rows / 500k users in {dt:.1f}s "
          f"({n/dt/1e6:.2f}M rows/s); zero holes remain")


def sec_mv(n=20_000_000):
    from searchengine_ray.stages.relational import pre_aggregate

    ds = _mk_events(n, users=1_000_000).materialize()
    spec = {"n_events": (None, "count"), "sum_value": ("v", "sum")}
    t0 = time.perf_counter()
    base = pre_aggregate(
        ds.map_batches(lambda df: df[df["event_id"] % 101 != 0],
                       batch_format="pandas"), ["user_id"], spec)
    import shutil
    shutil.rmtree("/tmp/graft_scratch/mv_scale", ignore_errors=True)
    base.write_parquet("/tmp/graft_scratch/mv_scale")
    t_build = time.perf_counter() - t0
    mv = rd.read_parquet("/tmp/graft_scratch/mv_scale")
    # the delta arrives as its OWN small input (a new log segment), as in
    # a real lakehouse — deriving it by filtering the base log would
    # re-scan exactly what the refresh claims not to read
    delta_ds = ds.map_batches(
        lambda df: df[df["event_id"] % 101 == 0],
        batch_format="pandas").materialize()
    t0 = time.perf_counter()
    delta = pre_aggregate(delta_ds, ["user_id"], spec)

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "n_events": df["n_events"].to_numpy(np.int64),
            "sum_value": df["sum_value"].to_numpy(np.float64)})

    merged = pre_aggregate(
        mv.map_batches(norm, batch_format="pandas")
        .union(delta.map_batches(norm, batch_format="pandas")),
        ["user_id"], {"n_events": ("n_events", "sum"),
                      "sum_value": ("sum_value", "sum")})
    tot = merged.map_batches(
        lambda df: pd.DataFrame({"n": [df["n_events"].sum()]}),
        batch_format="pandas").to_pandas()
    t_refresh = time.perf_counter() - t0
    assert int(tot["n"].sum()) == n
    print(f"mv_refresh: base build {t_build:.1f}s vs incremental refresh "
          f"{t_refresh:.1f}s at {n} events / 1M users "
          f"(delta 1/101 of the log); counts preserved")


def sec_pca(n=5_000_000, d=64):
    from searchengine_ray.stages import pca

    def gen(b: pd.DataFrame) -> pd.DataFrame:
        i = b["id"].to_numpy(np.int64)
        rng = np.random.default_rng(int(i[0]) + 1)
        return pd.DataFrame({
            "vec_id": i,
            "embedding": rng.normal(size=(len(i), d))
                         .astype(np.float32).tolist()})

    ds = (rd.range(n).repartition(64)
          .map_batches(gen, batch_format="pandas")).materialize()
    t0 = time.perf_counter()
    mean, comp, evals, nn = pca.pca_fit(ds, n_components=8)
    t_fit = time.perf_counter() - t0
    assert nn == n and comp.shape == (8, d)
    np.testing.assert_allclose(comp @ comp.T, np.eye(8), atol=1e-9)
    t0 = time.perf_counter()
    cnt = pca.pca_project(ds, mean, comp).map_batches(
        lambda df: pd.DataFrame({"n": [len(df)]}),
        batch_format="pandas").to_pandas()
    t_proj = time.perf_counter() - t0
    assert int(cnt["n"].sum()) == n
    print(f"pca: fit {n}x{d} in {t_fit:.1f}s ({n/t_fit/1e6:.2f}M rows/s), "
          f"project in {t_proj:.1f}s; basis orthonormal")


def sec_linkage(n=1_000_000):
    from searchengine_ray.stages.editdist import linkage_best_match

    def reg(b: pd.DataFrame) -> pd.DataFrame:
        i = b["id"].to_numpy(np.int64)
        return pd.DataFrame({
            "reg_id": i,
            "r_text": [f"entity{v:07d}name" for v in i]})

    def qry(b: pd.DataFrame) -> pd.DataFrame:
        i = b["id"].to_numpy(np.int64)
        t = [f"entity{v:07d}name"[:-1] if v % 2 else f"entity{v:07d}namex"
             for v in i]
        return pd.DataFrame({"query_id": i, "q_text": t})

    registry = rd.range(n).repartition(64).map_batches(
        reg, batch_format="pandas").materialize()
    queries = rd.range(n).repartition(64).map_batches(
        qry, batch_format="pandas").materialize()
    t0 = time.perf_counter()
    # block on 13 chars: 'entity' + 7 digits → ~1 registry row per block
    out = linkage_best_match(queries, registry, max_dist=2,
                             block_chars=13)
    agg = out.map_batches(
        lambda df: pd.DataFrame({
            "n": [len(df)],
            "self": [(df["query_id"] == df["match_id"]).sum()]}),
        batch_format="pandas").to_pandas()
    dt = time.perf_counter() - t0
    matched, self_hits = int(agg["n"].sum()), int(agg["self"].sum())
    assert matched == n and self_hits == n
    print(f"linkage_best_match: {n} queries x {n} registry in {dt:.1f}s "
          f"({n/dt/1e3:.0f}k pairs resolved/s); every query hits its "
          f"own entity")


SECTIONS = {"pivot": sec_pivot, "bfs": sec_bfs, "rank": sec_rank,
            "cms": sec_cms, "retention": sec_retention, "locf": sec_locf,
            "mv": sec_mv, "pca": sec_pca, "linkage": sec_linkage}


def main() -> None:
    names = sys.argv[1:] or list(SECTIONS)
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    for nm in names:
        SECTIONS[nm]()
    ray.shutdown()


if __name__ == "__main__":
    main()
