#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query result parquet written by graft.Verify, run the matching
oracle SQL in DuckDB over the same testdata tables, sort columns by name
and rows by all values, and compare cell-by-cell (with a small float
tolerance report so we can see *how* close mismatches are).
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize temporal and list types to strings for stable compare
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(lambda v: str(v) if isinstance(v, (list, np.ndarray, dict)) else v)
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)

fails = 0
for name in sorted(oracle):
    res_dir = os.path.join(out_dir, name)
    files = glob.glob(os.path.join(res_dir, "*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    got = canon(pq.read_table(files[0]).to_pandas())
    try:
        exp = canon(con.execute(oracle[name]).df())
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}"); fails += 1; continue
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); fails += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails += 1; continue
    ok = True
    for c in got.columns:
        g, e = got[c].values, exp[c].values
        if np.issubdtype(got[c].dtype, np.floating) or np.issubdtype(exp[c].dtype, np.floating):
            gg = got[c].astype(float).values; ee = exp[c].astype(float).values
            both_nan = np.isnan(gg) & np.isnan(ee)
            exact = np.sum((gg == ee) | both_nan)
            if exact != len(gg):
                mism = np.where(~((gg == ee) | both_nan))[0]
                md = np.nanmax(np.abs(gg[mism] - ee[mism]))
                print(f"  {name}.{c}: {len(mism)} inexact cells, max abs diff {md:.3e}")
                ok = False
        else:
            if not (pd.Series(g).fillna("<null>") == pd.Series(e).fillna("<null>")).all():
                n = (pd.Series(g).fillna("<null>") != pd.Series(e).fillna("<null>")).sum()
                print(f"  {name}.{c}: {n} cell mismatches (e.g. {g[:3]} vs {e[:3]})")
                ok = False
    if ok:
        print(f"PASS {name} ({len(got)} rows, {len(got.columns)} cols)")
    else:
        print(f"FAIL {name}"); fails += 1

print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
