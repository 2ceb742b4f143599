#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs
the matching SQL from oracle_sql.json in DuckDB over the same sf dir, and
compares schema + rows after normalization (column sort, row sort, float
rounding, integer widening). Exit code = number of mismatching queries.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        k = df[c].dtype.kind
        if k in "iu":
            df[c] = df[c].astype("int64")
        elif k == "f":
            df[c] = df[c].astype("float64").round(6)
        elif k == "M":
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif k == "O":
            # python Decimal (duckdb HUGEINT/DECIMAL) or str
            try:
                df[c] = pd.to_numeric(df[c])
                return norm(df)
            except (ValueError, TypeError):
                pass
    if len(df.columns):
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    fails = 0
    for name in sorted(oracle):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            fails += 1
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files])
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            fails += 1
            continue
        a, b = norm(spark_df.copy()), norm(duck_df.copy())
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: schema spark={list(a.columns)} duck={list(b.columns)}")
            fails += 1
        elif len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
            fails += 1
        elif not a.equals(b):
            diff = (a != b) & ~(a.isna() & b.isna())
            ndiff = int(diff.to_numpy().sum())
            print(f"FAIL {name}: {ndiff} differing cells of {a.size}")
            rows = diff.any(axis=1)
            print("  spark:", a[rows].head(3).to_dict("records"))
            print("  duck: ", b[rows].head(3).to_dict("records"))
            fails += 1
        else:
            print(f"OK   {name}: {len(a)} rows")
    print(f"{'PASS' if fails == 0 else 'FAIL'}: {len(oracle) - fails}/{len(oracle)} queries match")
    sys.exit(fails)

if __name__ == "__main__":
    main()
