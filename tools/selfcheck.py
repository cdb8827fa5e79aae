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

def _kind(dtype) -> str:
    s = str(dtype)
    if s.startswith(("float", "Float")):
        return "float"
    if s.startswith(("int", "uint", "Int", "UInt")):
        return "int"
    return "other"

def compare(a: pd.DataFrame, b: pd.DataFrame):
    """Dtype-strict column compare mirroring the driver's exact hash.

    The driver stringifies values before hashing, so an int64 2861 on the
    Spark side vs a float64 2861.0 from the oracle (DuckDB sum(BIGINT) →
    HUGEINT → pandas float64) is a hard FAIL there. Tolerance applies
    ONLY when both sides are genuinely float; any int-vs-float asymmetry
    is reported as DTYPE_MISMATCH so the uncast-sum class of oracle bug
    is caught locally (round-8 regression: q91/q92/q93/q98/q102).
    Returns "OK" or a failure string."""
    for c in a.columns:
        av, bv = a[c], b[c]
        ka, kb = _kind(av.dtype), _kind(bv.dtype)
        if (ka == "float") != (kb == "float"):
            return (f"DTYPE_MISMATCH col={c} spark={av.dtype} oracle={bv.dtype}"
                    f" (uncast aggregate in oracle SQL? CAST(... AS BIGINT))")
        if ka == "float" and kb == "float":
            av = pd.to_numeric(av, errors="coerce").astype(float)
            bv = pd.to_numeric(bv, errors="coerce").astype(float)
            ok = ((av - bv).abs() < 1e-6) | (av.isna() & bv.isna())
        else:
            ok = (av.astype(str) == bv.astype(str)) | (av.isna() & bv.isna())
        if not ok.all():
            i = int((~ok).idxmax())
            return f"VALUE_MISMATCH col={c} row={i} spark={a[c].iloc[i]!r} oracle={b[c].iloc[i]!r}"
    return "OK"

def selftest():
    """Regression for the round-8 miss: int64 vs float64 must FAIL even
    when values are numerically identical, and float-float must still
    tolerate sub-1e-6 noise."""
    import numpy as np
    i64 = pd.DataFrame({"n": pd.Series([2861, 7], dtype="int64")})
    f64 = pd.DataFrame({"n": pd.Series([2861.0, 7.0], dtype="float64")})
    r = compare(i64, f64)
    assert r.startswith("DTYPE_MISMATCH"), f"int-vs-float must fail, got {r}"
    r = compare(f64, f64.copy())
    assert r == "OK", r
    noisy = pd.DataFrame({"n": f64["n"] + 1e-9})
    assert compare(f64, noisy) == "OK"
    off = pd.DataFrame({"n": pd.Series([2861, 8], dtype="int64")})
    assert compare(i64, off).startswith("VALUE_MISMATCH")
    print("selfcheck selftest OK")

def main(sf_dir, out_dir, json_out=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    artifact = {}
    import time
    def emit(name, v, dt):
        # incremental + flushed so a pathological oracle at a big SF is
        # identifiable WHILE it runs (the culprit is the line after the
        # last printed one), and slow oracles carry their timing
        print(f"{'OK' if v=='OK' else 'XX'} {name}: {v} [{dt:.1f}s]",
              flush=True)
    import os
    skip = set(filter(None,
        os.environ.get("SPARK_GRAFT_ORACLE_SKIP", "").split(",")))
    for name in sorted(oracle):
        if name in skip:
            # documented exclusion (an oracle whose SQL form is
            # infeasible at this SF, e.g. a transitive-closure CTE) —
            # reported, never counted as a failure
            print(f"-- {name}: SKIPPED (SPARK_GRAFT_ORACLE_SKIP)",
                  flush=True)
            artifact[name] = {"rows_match": None, "schema_match": None,
                              "hash_match": None, "spark_rows": None,
                              "oracle_rows": None,
                              "err": "skipped: SPARK_GRAFT_ORACLE_SKIP"}
            continue
        sql = oracle[name]
        t0 = time.time()
        srows = orows = None
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            results[name] = "MISSING_SPARK_OUTPUT"
            emit(name, results[name], time.time() - t0)
        else:
            try:
                odf = con.execute(sql).df()
            except Exception as e:
                results[name] = f"ORACLE_ERROR: {e}"
                emit(name, results[name], time.time() - t0)
                odf = None
            if odf is not None:
                sdf = pd.concat([pd.read_parquet(f) for f in spark_files])
                srows, orows = len(sdf), len(odf)
                if sorted(odf.columns) != sorted(sdf.columns):
                    results[name] = f"SCHEMA_MISMATCH spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
                elif len(odf) != len(sdf):
                    results[name] = f"ROWCOUNT spark={len(sdf)} oracle={len(odf)}"
                else:
                    results[name] = compare(canon(sdf), canon(odf))
                emit(name, results[name], time.time() - t0)
        v = results.get(name, "MISSING_SPARK_OUTPUT")
        artifact[name] = {
            "rows_match": (srows == orows) if srows is not None else False,
            "schema_match": not v.startswith(("SCHEMA_MISMATCH",
                                              "MISSING_SPARK_OUTPUT",
                                              "ORACLE_ERROR")),
            "hash_match": v == "OK",
            "spark_rows": srows, "oracle_rows": orows,
            "err": None if v == "OK" else v[:300],
            "secs": round(time.time() - t0, 1)}
    n_ok = sum(1 for v in results.values() if v == "OK")
    for k, v in results.items():
        if v != "OK":
            print(f"✗ {k}: {v}")
    print(f"\n{n_ok}/{len(results)} OK (+{len(set(glob.glob(out_dir+'/q*')) ) - len(results)} rows-only)")
    if json_out:
        # driver-shaped artifact (same per-query record schema as
        # CORRECTNESS_r{N}.json) so an SF ratchet run is diffable and
        # re-verifiable instead of a PERF.md narrative
        with open(json_out, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"wrote {json_out} ({len(artifact)} entries)")

if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        selftest()
    else:
        # the space-separated form `--json out.json` must be rejected,
        # not silently swallowed: filtering the bare `--json` token while
        # leaving json_out None made the run look successful with no
        # artifact ever written
        bad = [a for a in sys.argv[1:]
               if a.startswith("--json") and not a.startswith("--json=")]
        if bad:
            sys.exit(f"usage: selfcheck.py SF_DIR OUT_DIR [--json=PATH] "
                     f"(got {bad[0]!r}; the --json form requires '=')")
        args = [a for a in sys.argv[1:] if not a.startswith("--json=")]
        json_out = next((a.split("=", 1)[1] for a in sys.argv[1:]
                         if a.startswith("--json=")), None)
        main(args[0], args[1], json_out)
