#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB over the sf parquet tables, load the Spark result parquet,
sort columns by name + rows by all values, and compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize floats to avoid representation noise
    for c in df.columns:
        if df[c].dtype == "float64" or df[c].dtype == "float32":
            df[c] = df[c].round(6)
        # decimal/object numeric → float
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(oracle):
        sql = oracle[name]
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as e:
            results[name] = f"ORACLE_ERROR: {e}"
            continue
        sdf = pd.concat([pd.read_parquet(f) for f in spark_files])
        if sorted(odf.columns) != sorted(sdf.columns):
            results[name] = f"SCHEMA_MISMATCH spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
            continue
        if len(odf) != len(sdf):
            results[name] = f"ROWCOUNT spark={len(sdf)} oracle={len(odf)}"
            continue
        a, b = canon(sdf), canon(odf)
        # compare column-wise with float tolerance
        bad = None
        for c in a.columns:
            av, bv = a[c], b[c]
            if str(av.dtype).startswith("float") or str(bv.dtype).startswith("float"):
                av = pd.to_numeric(av, errors="coerce").astype(float)
                bv = pd.to_numeric(bv, errors="coerce").astype(float)
                ok = ((av - bv).abs() < 1e-6) | (av.isna() & bv.isna())
            else:
                ok = (av.astype(str) == bv.astype(str)) | (av.isna() & bv.isna())
            if not ok.all():
                i = int((~ok).idxmax())
                bad = f"VALUE_MISMATCH col={c} row={i} spark={a[c].iloc[i]!r} oracle={b[c].iloc[i]!r}"
                break
        results[name] = bad or "OK"
    n_ok = sum(1 for v in results.values() if v == "OK")
    for k, v in results.items():
        print(f"{'✓' if v=='OK' else '✗'} {k}: {v}")
    print(f"\n{n_ok}/{len(results)} OK (+{len(set(glob.glob(out_dir+'/q*')) ) - len(results)} rows-only)")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
