#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Expects <verifyOutDir> to contain <name>/ parquet dirs written by
graft.Verify plus oracle_sql.json. Registers every parquet table of
<sfDir> as a DuckDB view, runs each oracle, canonicalizes both sides
(columns sorted by name, rows sorted) and compares EXACTLY — the
driver's gate hashes raw values, so a 1-ulp float difference fails
there; this replica must be at least as strict.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    # graft.Verify leaves a _failed/<name>.txt for every query that threw
    # — count each as a hard failure, never silent absence
    failed_dir = os.path.join(out_dir, "_failed")
    failed_names = set()
    if os.path.isdir(failed_dir):
        for f in sorted(os.listdir(failed_dir)):
            qname = f[:-len(".txt")]
            failed_names.add(qname)
            first = open(os.path.join(failed_dir, f)).readline().strip()
            print(f"FAIL  {qname}: query threw: {first[:200]}")
            n_fail += 1
    for name in sorted(os.listdir(out_dir)):
        if name == "_failed":
            continue
        # a query that threw THIS run may still have a stale <name>/
        # parquet dir from a previous run of the same outDir — comparing
        # it would print a bogus PASS alongside the FAIL above
        if name in failed_names:
            continue
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        spark_df = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
        if name not in oracles:
            print(f"SKIP  {name}: no oracle (rows={len(spark_df)})")
            n_skip += 1
            continue
        try:
            oracle_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        a, b = canon(spark_df), canon(oracle_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL  {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                          check_exact=True)
            print(f"PASS  {name} ({len(a)} rows)")
            n_pass += 1
        except AssertionError as e:
            print(f"FAIL  {name}: {str(e).splitlines()[-1] if str(e) else 'mismatch'}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
