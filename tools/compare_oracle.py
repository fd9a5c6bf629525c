#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Reads each <out>/<name>/ parquet dump produced by graft.Verify, runs the
corresponding oracle SQL from oracle_sql.json in DuckDB against the same
sf directory's parquet tables, and compares schema column names, row counts,
and exact values (both in emitted order and order-insensitively).
"""
import json, sys, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = pq.read_table(files).to_pandas()
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1; continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} vs {ec}"); n_fail += 1; continue
        got, exp = got[gc].reset_index(drop=True), exp[gc].reset_index(drop=True)
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        # normalize dtypes for compare
        def norm(df):
            out = {}
            for c in df.columns:
                s = df[c]
                if s.dtype == object:
                    out[c] = s.astype(str)
                else:
                    try: out[c] = pd.to_numeric(s)
                    except Exception: out[c] = s
            return pd.DataFrame(out)
        g, e = norm(got), norm(exp)
        inorder = g.equals(e)
        gs = g.sort_values(by=gc, kind="mergesort").reset_index(drop=True)
        es = e.sort_values(by=gc, kind="mergesort").reset_index(drop=True)
        sorted_eq = gs.equals(es)
        if inorder and sorted_eq:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        else:
            print(f"FAIL {name}: inorder={inorder} sorted={sorted_eq} rows={len(got)}")
            diff = (gs != es)
            badcols = [c for c in gc if diff[c].any()]
            print(f"  differing cols: {badcols}")
            for c in badcols[:3]:
                idx = diff[c].idxmax()
                print(f"  first diff {c}[{idx}]: spark={gs[c][idx]!r} duck={es[c][idx]!r}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
