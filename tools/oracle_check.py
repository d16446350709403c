#!/usr/bin/env python3
"""Local dev harness mirroring the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [query ...]

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the testdata
tables, canonicalizes both sides (columns sorted by name, rows sorted by
all columns, floats rounded), and reports per-query PASS/FAIL.

Dev tool only — the engine's Scala code has no dependency on this.
"""
import sys, os, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == "float64" or df[c].dtype == "float32":
            df[c] = df[c].astype("float64").round(9)
        # normalize datetimes to us precision, tz-naive
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[us]")
        # normalize nullable ints to float-free int64 where possible
        if str(df[c].dtype) in ("Int64", "Int32", "int32"):
            df[c] = df[c].astype("int64")
        if df[c].dtype == object:
            df[c] = df[c].apply(lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                                 type(v).__name__ == "ndarray" else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_noracle = 0
    for name in names:
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no spark output parquet"); n_fail += 1; continue
        got = canon(con.execute(
            f"SELECT * FROM read_parquet({files!r})").df())
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows"); n_noracle += 1
            continue
        try:
            exp = canon(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"[FAIL] {name}: columns got={list(got.columns)} exp={list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"[FAIL] {name}: rowcount got={len(got)} exp={len(exp)}")
            n_fail += 1; continue
        if got.equals(exp):
            print(f"[PASS] {name} ({len(got)} rows)"); n_pass += 1
        else:
            neq = (got != exp) & ~(got.isna() & exp.isna())
            bad_cols = [c for c in got.columns if neq[c].any()]
            print(f"[FAIL] {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:3]:
                idx = neq[c].idxmax()
                print(f"    {c}[{idx}]: got={got[c][idx]!r} exp={exp[c][idx]!r}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
