#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle gate.

Usage: oracle_check.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify, runs the matching oracle SQL in
DuckDB over the same parquet tables, sorts columns by name, and compares
row counts, schemas (loosely) and values (exact after per-cell
normalization). Prints one line per query: OK / MISMATCH / ROWS-ONLY.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v

def frame_sig(df):
    df = df[sorted(df.columns)]
    rows = []
    for t in df.itertuples(index=False):
        rows.append(tuple(norm_cell(v) for v in t))
    return rows

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, t + ".parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    ok = bad = rows_only = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(qdir)
        if not os.path.isdir(qdir):
            continue
        spark_df = pd.concat(
            [pd.read_parquet(f) for f in sorted(glob.glob(qdir + "/*.parquet"))],
            ignore_index=True) if glob.glob(qdir + "/*.parquet") else pd.DataFrame()
        if name not in oracle:
            print(f"ROWS-ONLY {name}: {len(spark_df)} rows")
            rows_only += 1
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            bad += 1
            continue
        a, b = frame_sig(spark_df), frame_sig(duck_df)
        if sorted(spark_df.columns) != sorted(duck_df.columns):
            print(f"MISMATCH {name}: columns {sorted(spark_df.columns)} vs {sorted(duck_df.columns)}")
            bad += 1
        elif len(a) != len(b):
            print(f"MISMATCH {name}: rows {len(a)} vs {len(b)}")
            bad += 1
        elif a != b:
            diffs = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
            print(f"MISMATCH {name}: values, first diffs {diffs}")
            bad += 1
        else:
            print(f"OK {name}: {len(a)} rows")
            ok += 1
    print(f"\n{ok} ok, {bad} mismatched, {rows_only} rows-only")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
