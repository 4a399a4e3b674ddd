"""Driver-mimic: run every __ray_entry__ query at sf0.01 and compare with
its DuckDB oracle (row count + column names + order-insensitive values)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd
import ray

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import __ray_entry__ as e

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

import os

# oracle_sql(sf) owns the dual-read /tmp path templating (the driver calls
# it with no argument at sf0.01; any other sf rewrites every fixed path)
_sf_name = os.path.basename(os.path.normpath(SF_DIR))
qs, oracles = e.queries(), e.oracle_sql(_sf_name)


def to_df(res):
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


fails = []
for name, fn in qs.items():
    if ONLY and name not in ONLY:
        continue
    t0 = time.perf_counter()
    try:
        df = to_df(fn(SF_DIR))
    except Exception as ex:
        print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
        fails.append(name)
        continue
    wall = time.perf_counter() - t0
    sql = oracles.get(name)
    if sql is None:
        print(f"ok   {name}: rows={len(df)} cols={sorted(df.columns)} wall={wall:.1f}s (rows-only)")
        continue
    ora = con.sql(sql).df()
    a, b = canon(df), canon(ora)
    if list(a.columns) != list(b.columns):
        print(f"FAIL {name}: columns ray={list(a.columns)} sql={list(b.columns)}")
        fails.append(name)
        continue
    if len(a) != len(b):
        print(f"FAIL {name}: rows ray={len(a)} sql={len(b)}")
        fails.append(name)
        continue
    if not a.equals(b):
        neq = (a != b) & ~(a.isna() & b.isna())
        bad_cols = [c for c in a.columns if neq[c].any()]
        print(f"FAIL {name}: value mismatch in {bad_cols}")
        for c in bad_cols[:2]:
            idx = neq[c].idxmax()
            print(f"      {c}[{idx}]: ray={a[c][idx]!r} sql={b[c][idx]!r}")
        fails.append(name)
        continue
    print(f"PASS {name}: rows={len(a)} wall={wall:.1f}s")

print("\nentry():", end=" ")
try:
    df = to_df(e.entry())
    print(f"rows={len(df)} cols={sorted(df.columns)}")
except Exception as ex:
    print(f"RAISED {type(ex).__name__}: {ex}")
    fails.append("entry")

ray.shutdown()
print("FAILURES:", fails if fails else "none")
sys.exit(1 if fails else 0)
