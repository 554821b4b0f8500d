#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB differential check.

Usage: python3 scripts/check.py /root/testdata/sf0.01 /tmp/verify_out
Reads each <out>/<name>/ parquet (Spark result) and runs <out>/oracle_sql.json
in DuckDB with views for each testdata table, then compares values with
columns sorted by name and rows sorted by all columns.
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')").df()
            exp = con.execute(sql).df()
            g, e = canon(got), canon(exp)
            if list(g.columns) != list(e.columns):
                print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}"); n_fail += 1; continue
            if len(g) != len(e):
                print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
            ok = True
            for c in g.columns:
                a, b = g[c], e[c]
                if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                    a = a.astype(float); b = b.astype(float)
                    diff = (a - b).abs()
                    bad = ~((a.isna() & b.isna()) | (diff == 0))
                    if bad.any():
                        md = diff[bad & diff.notna()].max()
                        print(f"FAIL {name}: col {c} {int(bad.sum())} mismatches, maxdiff={md}")
                        ok = False
                else:
                    ga = a.astype(str); gb = b.astype(str)
                    bad = ga != gb
                    if bad.any():
                        i = bad.idxmax()
                        print(f"FAIL {name}: col {c} {int(bad.sum())} mismatches e.g. {ga[i]!r} vs {gb[i]!r}")
                        ok = False
            if ok: print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
            else: n_fail += 1
        except Exception as ex:
            print(f"ERROR {name}: {ex}"); n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
