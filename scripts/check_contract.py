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

qs, oracles = e.queries(), e.oracle_sql()

# The driver runs oracle SQL verbatim at sf0.01, so the dual-read oracles
# (kg_exact_label_hits, kg_cooccurrence_edges) hard-code sf0.01 /tmp paths.
# When checking another SF_DIR, rewrite those paths to the sf the Ray side
# actually writes — otherwise we'd silently compare against stale sf0.01
# output (or fail on a missing path).
import os

_sf_name = os.path.basename(os.path.normpath(SF_DIR))
if _sf_name != "sf0.01":
    _n = e._CORPUS_ROWS.get(_sf_name, 1000)
    oracles = {
        k: v.replace("corpus-sf0.01-1000-", f"corpus-{_sf_name}-{_n}-")
             .replace("triples-sf0.01", f"triples-{_sf_name}")
             .replace("semdedup-assign-sf0.01", f"semdedup-assign-{_sf_name}")
             .replace("streamdup-pairs-sf0.01", f"streamdup-pairs-{_sf_name}")
        for k, v in oracles.items()
    }


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
