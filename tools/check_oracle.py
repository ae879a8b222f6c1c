#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [--strict]

For each query result parquet written by graft.Verify, run the matching
oracle SQL in DuckDB over the same testdata tables, sort columns by name
and rows by all values, and compare cell-by-cell (with a small float
tolerance report so we can see *how* close mismatches are).

STRICTER THAN THE OLD STAND-IN (the r5/r6 lesson — four driver-RED rows
all passed here):
 - dtype check: a DuckDB integer aggregate without CAST comes back as
   HUGEINT -> pandas float64, while Spark writes int64. Values compare
   equal under a float-tolerant check, but any dtype- or
   representation-sensitive hash (the driver's) flips. Any
   int-vs-float dtype divergence is now a FAIL.
 - --strict additionally hashes rows in FILE ORDER (no row sort) on
   both sides: a query whose verdict flips between sorted and strict
   modes is not gate-safe under an order-sensitive driver hash.
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

args = [a for a in sys.argv[1:] if not a.startswith("--")]
STRICT = "--strict" in sys.argv
sf_dir, out_dir = args[0], args[1]
oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

# r18 verdict #4 (gate-harness review): two vacuous-pass shapes.
# An EMPTY oracle set must never exit green — "0/0 queries match" is
# a broken Verify run (or a filter that matched nothing), not a pass.
if not oracle:
    print("FAIL: oracle_sql.json holds zero queries — nothing was gated")
    sys.exit(1)
# A dumped result directory with no oracle entry is either key drift
# (now refused at assembly by SparkEntry.oracleSql's coverage guard)
# or a stale dump from a prior broader run into a reused out_dir —
# warn loudly; only the oracle-keyed set below is the gate.
orphans = sorted(d for d in os.listdir(out_dir)
                 if os.path.isdir(os.path.join(out_dir, d)) and d not in oracle)
if orphans:
    print(f"WARN: {len(orphans)} result dirs have no oracle entry "
          f"(stale dumps from a prior run?): {', '.join(orphans[:5])}"
          + (" ..." if len(orphans) > 5 else ""), file=sys.stderr)

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def canon(df: pd.DataFrame, sort_rows: bool = True) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize temporal and list types to strings for stable compare
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(lambda v: str(v) if isinstance(v, (list, np.ndarray, dict)) else v)
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    if sort_rows:
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def dtype_kind(dt) -> str:
    """Coarse dtype class the driver's hash could distinguish."""
    if np.issubdtype(dt, np.floating):
        return "float"
    if np.issubdtype(dt, np.integer):
        return "int"
    if np.issubdtype(dt, np.bool_):
        return "bool"
    return "other"

def check_one(name):
    """Compare one query; returns True on pass. Raises nothing the
    caller can't survive — a malformed result (unsortable mixed-type
    object column, unreadable parquet) must FAIL that query, not abort
    the remaining battery mid-run (r18 verdict #4)."""
    res_dir = os.path.join(out_dir, name)
    files = glob.glob(os.path.join(res_dir, "*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output"); return False
    got_raw = pq.read_table(files[0]).to_pandas()
    got = canon(got_raw)
    try:
        exp_raw = con.execute(oracle[name]).df()
        exp = canon(exp_raw)
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}"); return False
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); return False
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); return False
    ok = True
    for c in got.columns:
        gk, ek = dtype_kind(got[c].dtype), dtype_kind(exp[c].dtype)
        if gk != ek:
            print(f"  {name}.{c}: DTYPE {got[c].dtype} (spark) vs {exp[c].dtype} (oracle)"
                  f" — un-CAST integer aggregate? driver hash would flip")
            ok = False
    if STRICT:
        gs = canon(got_raw, sort_rows=False)
        es = canon(exp_raw, sort_rows=False)
        for c in gs.columns:
            # fillna BEFORE astype(str): afterwards NaN/None are already
            # the literal strings "nan"/"None" and a real null would
            # compare equal to a literal "None" varchar cell
            a = gs[c].fillna("<null>").astype(str)
            b = es[c].fillna("<null>").astype(str)
            if not (a.values == b.values).all():
                print(f"  {name}.{c}: FILE-ORDER mismatch "
                      f"({int((a.values != b.values).sum())} cells) — not gate-safe "
                      f"under an order-sensitive hash")
                ok = False
    for c in got.columns:
        g, e = got[c].values, exp[c].values
        if np.issubdtype(got[c].dtype, np.floating) or np.issubdtype(exp[c].dtype, np.floating):
            # one side float, other side non-numeric objects (a
            # stringified array/datetime against a DOUBLE oracle):
            # report the mismatch instead of crashing the whole
            # checker mid-battery on the ValueError
            try:
                gg = got[c].astype(float).values; ee = exp[c].astype(float).values
            except (ValueError, TypeError) as e:
                print(f"  {name}.{c}: type clash on float compare: {e}")
                ok = False
                continue
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
        print(f"FAIL {name}")
    return ok

fails = 0
for name in sorted(oracle):
    try:
        if not check_one(name):
            fails += 1
    except Exception as e:
        # containment, not a verdict: an unexpected error IS a failure
        # for this query, and the rest of the battery still runs
        print(f"FAIL {name}: checker error: {type(e).__name__}: {e}")
        fails += 1

print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
