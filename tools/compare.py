#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfdir> <verify_out_dir>

For each query result parquet in verify_out_dir, runs the matching
oracle SQL from oracle_sql.json in DuckDB with the sf tables
registered as views, sorts columns by name + rows, and compares.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(con, rel_sql):
    df = con.sql(rel_sql).fetchdf()
    df = df[sorted(df.columns)]
    # round-trip through strings for stable compare
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        res_dir = f"{outdir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"MISSING   {name}"); n_fail += 1; continue
        try:
            got = canon(con, f"SELECT * FROM '{files[0]}'")
            want = canon(con, sql)
        except Exception as e:
            print(f"ERROR     {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"SCHEMA    {name}: got {list(got.columns)} want {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"ROWS      {name}: got {len(got)} want {len(want)}")
            n_fail += 1; continue
        gs, ws = got.astype(str), want.astype(str)
        if not gs.equals(ws):
            diff = (gs != ws).any(axis=1)
            print(f"VALUES    {name}: {diff.sum()} differing rows, first:")
            print("  got :", gs[diff].head(2).to_dict("records"))
            print("  want:", ws[diff].head(2).to_dict("records"))
            n_fail += 1; continue
        print(f"OK        {name} ({len(got)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
