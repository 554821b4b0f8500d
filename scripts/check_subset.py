#!/usr/bin/env python3
"""Focused oracle check: compare only the queries dumped into <out_dir>
(a graft.Verify run restricted to named queries) against oracle_sql.json.

Usage: python3 scripts/check_subset.py /root/testdata/sf0.01 /tmp/v_sub
"""
import json, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        if not os.path.isdir(f"{out_dir}/{name}"):
            continue
        got = canon(con.execute(
            f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')").df())
        exp = canon(con.execute(oracle[name]).df())
        if got.shape != exp.shape or list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: shape {got.shape} vs {exp.shape}")
            n_fail += 1
            continue
        ok = True
        for c in got.columns:
            a, b = got[c], exp[c]
            if a.dtype.kind in "fi" and b.dtype.kind in "fi":
                # NaN-aware: plain (a-b).abs().max() > tol is False when the
                # max is NaN, silently PASSing a NaN-vs-value divergence
                af, bf = a.astype(float).to_numpy(), b.astype(float).to_numpy()
                import numpy as np
                if not (np.isclose(af, bf, rtol=0, atol=1e-9, equal_nan=True).all()
                        and (np.isnan(af) == np.isnan(bf)).all()):
                    ok = False
            elif not a.equals(b):
                ok = False
        if ok:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: values differ")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
