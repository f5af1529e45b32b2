#!/usr/bin/env python3
"""Local pre-check of SparkEntry oracles: replicates the driver's DuckDB
compare (sorted columns, sorted rows, hashed values) against the Verify
output directory. Dev tool only — the shipped engine has no Python deps.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def load(sf_dir, con):
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    # Sort on ROUNDED float values (6 dp, matching the queries' own rounding):
    # sub-tolerance cross-engine jitter must not reorder rows between the two
    # frames, or the element-wise compare misaligns and reports spurious 'far'.
    key = df.copy()
    for c in key.columns:
        if np.issubdtype(key[c].dtype, np.floating):
            key[c] = key[c].round(6)
    order = key.sort_values(by=list(key.columns)).index
    return df.loc[order].reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    load(sf_dir, con)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = []
    for name in sorted(os.listdir(out_dir)):
        qdir = f"{out_dir}/{name}"
        if not os.path.isdir(qdir):
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{qdir}/*.parquet")],
                             ignore_index=True) if glob.glob(f"{qdir}/*.parquet") else pd.DataFrame()
        if name not in oracle:
            print(f"{name:28s} ROWS-ONLY rows={len(spark_df)}")
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"{name:28s} ORACLE-ERROR {e}")
            fails.append(name)
            continue
        a, b = norm(spark_df), norm(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"{name:28s} COLS-MISMATCH spark={list(a.columns)} duck={list(b.columns)}")
            fails.append(name); continue
        if len(a) != len(b):
            print(f"{name:28s} ROWS-MISMATCH spark={len(a)} duck={len(b)}")
            fails.append(name); continue
        # The driver hashes FORMATTED values, so an int64 column on one side
        # and float64 on the other ("20" vs "20.0") is a hash failure even
        # when the numbers agree — the q143/HUGEINT class this check exists
        # to catch. Reject int-vs-float kind drift BEFORE the numeric value
        # compare below can launder it through astype(float). Other kind
        # pairs (e.g. object date vs datetime64) stay on the string-compare
        # path, which the driver's formatting is known to agree with.
        def kind(dt):
            return {"i": "int", "u": "int", "f": "float"}.get(dt.kind, "other")
        kind_bad = [(c, kind(a[c].dtype), kind(b[c].dtype)) for c in a.columns
                    if {kind(a[c].dtype), kind(b[c].dtype)} == {"int", "float"}]
        if kind_bad:
            print(f"{name:28s} DTYPE-MISMATCH {kind_bad[:4]} (spark,duck)")
            fails.append(name); continue
        diff_cols = []
        for c in a.columns:
            av, bv = a[c].values, b[c].values
            if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(b[c].dtype, np.floating):
                av = pd.to_numeric(a[c], errors="coerce").values.astype(float)
                bv = pd.to_numeric(b[c], errors="coerce").values.astype(float)
                eq = (av == bv) | (np.isnan(av) & np.isnan(bv))
                exact = eq.all()
                close = np.allclose(av, bv, rtol=0, atol=1e-9, equal_nan=True)
                if not exact:
                    diff_cols.append((c, "close" if close else "far",
                                      float(np.nanmax(np.abs(av - bv)))))
            else:
                av2 = a[c].astype(str).where(a[c].notna(), None)
                bv2 = b[c].astype(str).where(b[c].notna(), None)
                if not av2.equals(bv2):
                    n_bad = int((av2 != bv2).sum())
                    diff_cols.append((c, f"{n_bad} diff", ""))
        if diff_cols:
            print(f"{name:28s} VALUE-MISMATCH {diff_cols[:4]}")
            fails.append(name)
        else:
            print(f"{name:28s} OK rows={len(a)}")
    print(f"\n{len(fails)} failures: {fails}" if fails else "\nALL OK")
    return 1 if fails else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
