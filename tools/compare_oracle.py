#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: read the Spark parquet result,
run the oracle SQL (from oracle_sql.json) in DuckDB with each
<sfDir>/<table>.parquet registered as a view, sort columns by name,
and compare row-by-row (rows sorted by all columns as strings).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def cell_eq(a, b):
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (abs(a - b) < 1e-12)
    return str(a) == str(b)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = os.path.join(out_dir, name)
        try:
            spark_df = pd.concat(
                [pd.read_parquet(f) for f in sorted(glob.glob(qdir + "/*.parquet"))],
                ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})"); n_fail += 1; continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        s, o = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} oracle={list(o.columns)}")
            n_fail += 1; continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows spark={len(s)} oracle={len(o)}")
            n_fail += 1; continue
        bad = None
        for i in range(len(s)):
            for c in s.columns:
                if not cell_eq(s.at[i, c], o.at[i, c]):
                    bad = (i, c, s.at[i, c], o.at[i, c]); break
            if bad: break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} oracle={bad[3]!r}")
            n_fail += 1
        else:
            # exact-hash check too (driver may hash string forms)
            exact = all(
                str(s.at[i, c]) == str(o.at[i, c])
                for i in range(len(s)) for c in s.columns)
            tag = "PASS" if exact else "PASS(~tol)"
            print(f"{tag} {name}: {len(s)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
