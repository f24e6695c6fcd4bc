"""Dry-run of the driver's correctness gate: run every queries() entry at
sf=0.01 and compare SQL-backed ones against oracle_sql() via DuckDB with the
driver's comparison shape (row count + sorted-column value equality).

Usage: python tools/driver_dryrun.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, ".")
    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    # optional 2nd arg: comma-separated query names to gate (default all)
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    failures = []
    for name, fn in queries.items():
        if only is not None and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            res = fn(sf_dir)
            if hasattr(res, "to_pandas"):
                res = res.to_pandas()
            sec = time.perf_counter() - t0
        except Exception as e:
            failures.append(f"{name}: RAY ERROR {e}")
            print(f"{name:24s} ERROR {e}")
            continue
        if name not in oracles:
            print(f"{name:24s} rows-only  rows={len(res):7d}  {sec:6.2f}s")
            continue
        sql_df = con.sql(oracles[name]).df()
        a, b = canon(res), canon(sql_df)
        ok = list(a.columns) == list(b.columns) and len(a) == len(b)
        if ok:
            for c in a.columns:
                av, bv = a[c].to_numpy(), b[c].to_numpy()
                a_f = np.issubdtype(np.asarray(av).dtype, np.floating)
                b_f = np.issubdtype(np.asarray(bv).dtype, np.floating)
                try:
                    if a_f != b_f:
                        # the real driver hashes the representation — an
                        # int64-vs-float64 dtype drift fails there even when
                        # values agree, so fail it here too
                        ok = False
                        failures.append(
                            f"{name}: column {c} dtype drift "
                            f"{np.asarray(av).dtype} vs {np.asarray(bv).dtype}")
                        break
                    if a_f and b_f:
                        ok = np.allclose(av.astype(float), bv.astype(float),
                                         rtol=0, atol=1e-9)
                    else:
                        ok = bool((av == bv).all())
                except Exception:
                    ok = False
                if not ok:
                    failures.append(f"{name}: column {c} mismatch")
                    break
        else:
            failures.append(
                f"{name}: shape {list(a.columns)}/{len(a)} vs {list(b.columns)}/{len(b)}")
        print(f"{name:24s} {'OK ' if ok else 'FAIL'} rows={len(a):7d}  {sec:6.2f}s")
    print("\nFAILURES:" if failures else "\nALL MATCH")
    for f in failures:
        print(" ", f)
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
