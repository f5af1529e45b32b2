#!/usr/bin/env python3
"""DuckDB half of the scaling comparison (see graft.ScalingBench): time the
named queries' oracle SQL at sf0.001/sf0.01/sf0.1 — fetch-materialized,
median of 3 after a warm-up pass, all threads. Dev tool only.

Usage: python3 tools/scaling_check.py <verifyOutDirWithOracleJson> [query...]
"""
import sys, json, glob, os, time
import duckdb

DEFAULT = ["q12_revenue_by_nation", "q49_asof_join",
           "q61_range_frame", "q63_gold_kpis"]
SFS = ["sf0.001", "sf0.01", "sf0.1"]

def main(out_dir, names):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    result = {}
    for sf in SFS:
        con = duckdb.connect()
        for p in glob.glob(f"/root/testdata/{sf}/*.parquet"):
            t = os.path.basename(p).replace(".parquet", "")
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        for name in names:
            con.execute(oracle[name]).fetchall()  # warm-up
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                con.execute(oracle[name]).fetchall()
                ts.append(time.perf_counter() - t0)
            result.setdefault(name, {})[sf] = round(sorted(ts)[1], 3)
        con.close()
    print(json.dumps(result))

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:] or DEFAULT)
