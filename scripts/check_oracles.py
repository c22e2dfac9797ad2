"""Local replica of the driver's correctness gate: run every queries()
entry at sf0.01 alongside its oracle_sql() and compare row count, column
names, and order-insensitive values. Usage:

    python scripts/check_oracles.py [--exact] [sf_dir] [query ...]

--exact: require BIT-IDENTICAL float values (the driver hashes canonical
values, so a 1-ulp divergence that passes allclose still fails the
driver's hash_match — this mode reproduces that failure locally).
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(
    name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame, exact: bool = False
) -> str:
    if len(ray_df) != len(sql_df):
        return f"ROWS {len(ray_df)} vs {len(sql_df)}"
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        return f"SCHEMA {sorted(ray_df.columns)} vs {sorted(sql_df.columns)}"
    a, b = canon(ray_df), canon(sql_df)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        # The driver hashes canonical values INCLUDING enough of their
        # binary representation that an engine int64 vs an oracle float64
        # (a DuckDB HUGEINT SUM materialized by pandas as float64)
        # hash-fails even when every value is numerically identical — this
        # bit the gate twice (sessionize r02+r04, anomaly_scenarios r04).
        # Integer WIDTH differences are driver-proven harmless
        # (phash_near_dup int8-vs-int64 and similarity_report/bfs_distance
        # int32-vs-int64 were driver-green), so fail on KIND mismatches
        # (int vs float vs bool vs object) and float-width mismatches only.
        if av.dtype.kind != bv.dtype.kind or (
            av.dtype.kind == "f" and av.dtype != bv.dtype
        ):
            return f"DTYPE col={c} ray={av.dtype} sql={bv.dtype}"
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            af, bf = av.astype(float), bv.astype(float)
            eq = (af == bf) | (np.isnan(af) & np.isnan(bf))
            if not exact:
                eq |= np.isclose(af, bf, atol=1e-9, equal_nan=True)
            ok = eq.all()
        else:
            eq = av == bv
            ok = eq.all()
        if not ok:
            bad = np.flatnonzero(~eq)[:3]
            tag = "VALUES-EXACT" if exact else "VALUES"
            return f"{tag} col={c} rows={bad.tolist()} ray={av[bad]} sql={bv[bad]}"
    return "OK"


def main():
    import ray

    ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    argv = [a for a in sys.argv[1:] if a != "--exact"]
    exact = "--exact" in sys.argv[1:]
    sf = argv[0] if argv else "/root/testdata/sf0.01"
    # data-derived oracle constants (IVF centroids, embedding dims) must be
    # generated from the SAME scale the engine reads, or knn_ivf/ann_recall
    # falsely diverge at non-sf0.01 scales; must be set before the import
    os.environ["GRAFT_ORACLE_SF"] = sf

    import __ray_entry__ as mod
    only = set(argv[1:])
    qs = mod.queries()
    oracles = mod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_df(fn(sf))
        except Exception as e:
            print(f"{name:26s} RAY-ERROR {type(e).__name__}: {str(e)[:200]}")
            failures.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"{name:26s} rows-only  {len(ray_df):7d} rows  {dt:6.1f}s")
            continue
        try:
            sql_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"{name:26s} SQL-ERROR {type(e).__name__}: {str(e)[:200]}")
            failures.append(name)
            continue
        verdict = compare(name, ray_df, sql_df, exact=exact)
        print(f"{name:26s} {verdict:40s} {len(ray_df):7d} rows  {dt:6.1f}s")
        if verdict != "OK":
            failures.append(name)
    print("FAILURES:", failures if failures else "none")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
