#!/usr/bin/env python3
"""Local simulation of the driver's DuckDB-oracle compare (dev tool only;
the engine itself has no Python dependency).

Usage: python3 tools/check_oracle.py /tmp/verify_out /root/testdata/sf0.01
Loads each <name>/ parquet result written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sf parquet tables, sorts
columns by name, sorts rows, and diffs values.
"""
import json, os, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def table_pattern(sfdir, t):
    # shipped testdata is one file per table; SoakGen dirs are Spark
    # output directories of part files
    p = f"{sfdir}/{t}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize for stable compare
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_pattern(sfdir, t)}')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark result"); n_bad += 1; continue
        got = canon(con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf())
        try:
            exp = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}"); n_bad += 1; continue
        if got.shape != exp.shape:
            print(f"SHAPE    {name}: spark {got.shape} duckdb {exp.shape}"); n_bad += 1; continue
        # the driver's hash compare is value-repr sensitive: an int64 vs
        # float64 column (e.g. DuckDB sum(BIGINT) -> HUGEINT -> float)
        # hash-mismatches even when values are numerically equal
        if set(got.columns) != set(exp.columns):
            print(f"COLUMNS  {name}: spark {sorted(got.columns)} duckdb {sorted(exp.columns)}")
            n_bad += 1
            continue
        dtype_warn = [c for c in got.columns
                      if (got[c].dtype.kind in "if") != (exp[c].dtype.kind in "if")
                      or (got[c].dtype.kind == "i") != (exp[c].dtype.kind == "i")]
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                          check_exact=False, rtol=0, atol=1e-9)
            if dtype_warn:
                print(f"DTYPE    {name}: {[(c, str(got[c].dtype), str(exp[c].dtype)) for c in dtype_warn]}")
                n_bad += 1
            else:
                print(f"OK       {name} ({got.shape[0]} rows)"); n_ok += 1
        except AssertionError as e:
            print(f"MISMATCH {name}: {str(e).splitlines()[-1][:200]}"); n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
