#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/<query>/ parquet (Spark output) and
<verifyOutDir>/oracle_sql.json, runs each oracle SQL in DuckDB against the
sfDir parquet tables, and compares rows/schema/values with column-name
sorting and row-order-insensitive hashing (mirrors the driver contract).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for t in ("documents", "embeddings"):
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize ints
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fails = []
for name in sorted(oracle):
    spark_path = f"{out_dir}/{name}"
    files = glob.glob(f"{spark_path}/*.parquet")
    if not files:
        print(f"{name:24s} MISSING spark output")
        fails.append(name)
        continue
    sdf = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    try:
        odf = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"{name:24s} ORACLE SQL ERROR: {e}")
        fails.append(name)
        continue
    rows_ok = len(sdf) == len(odf)
    schema_ok = sorted(map(str.lower, sdf.columns)) == sorted(map(str.lower, odf.columns))
    if not schema_ok:
        print(f"{name:24s} SCHEMA MISMATCH spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        fails.append(name)
        continue
    odf.columns = [c.lower() for c in odf.columns]
    sdf.columns = [c.lower() for c in sdf.columns]
    s, o = canon(sdf), canon(odf)
    if not rows_ok:
        print(f"{name:24s} ROWS MISMATCH spark={len(s)} oracle={len(o)}")
        fails.append(name)
        continue
    eq = s.equals(o)
    if not eq:
        diff = (s != o).any(axis=1) if s.shape == o.shape else None
        print(f"{name:24s} VALUE MISMATCH ({0 if diff is None else int(diff.sum())} rows differ)")
        if diff is not None and diff.sum() > 0:
            idx = diff[diff].index[:5]
            for i in idx:
                print(f"    spark : {s.loc[i].to_dict()}")
                print(f"    oracle: {o.loc[i].to_dict()}")
        fails.append(name)
    else:
        print(f"{name:24s} MATCH ({len(s)} rows)")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} MATCH; failures: {fails}")
sys.exit(1 if fails else 0)
