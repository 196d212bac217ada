#!/usr/bin/env python3
"""check_oracle.py with per-query wall-clock, an explicit skip list, and a
done-list resume (dev tool for long at-scale verifies; the engine itself
has no Python dependency).

Usage: check_oracle_resume.py <outdir> <sfdir> [--skip a,b] [--done donelog]
                              [--only a,b] [--threads N] [--mem 30GB]
--only restricts to the named queries (shard runner for parallel compares);
--threads/--mem cap the DuckDB process so shards coexist on one host.
"""
import json, os, sys, glob, time
import duckdb
import pandas as pd
sys.path.insert(0, os.path.dirname(__file__))
from check_oracle import TABLES, table_pattern, canon

def main(outdir, sfdir, skip, done, only=None, threads=None, mem=None):
    con = duckdb.connect()
    if threads: con.execute(f"SET threads={threads}")
    if mem: con.execute(f"SET memory_limit='{mem}'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_pattern(sfdir, t)}')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = n_resumed = 0
    for name, sql in sorted(oracles.items()):
        if only is not None and name not in only:
            continue
        if name in done:
            # carried over from --done, NOT verified by this invocation —
            # tallied separately so a fully-resumed shard can't print
            # "0 ok, 0 bad" and read as a passing verify
            n_resumed += 1
            continue
        if name in skip:
            print(f"SKIP     {name}", flush=True); continue
        t0 = time.time()
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark result", flush=True); n_bad += 1; continue
        got = canon(con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf())
        try:
            exp = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}", flush=True); n_bad += 1; continue
        if got.shape != exp.shape:
            print(f"SHAPE    {name}: spark {got.shape} duckdb {exp.shape}", flush=True); n_bad += 1; continue
        if set(got.columns) != set(exp.columns):
            print(f"COLUMNS  {name}: spark {sorted(got.columns)} duckdb {sorted(exp.columns)}", flush=True)
            n_bad += 1; continue
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                          check_exact=False, rtol=0, atol=1e-9)
            print(f"OK       {name} ({got.shape[0]} rows) [{time.time()-t0:.1f}s]", flush=True); n_ok += 1
        except AssertionError as e:
            print(f"MISMATCH {name}: {str(e).splitlines()[-1][:200]}", flush=True); n_bad += 1
    print(f"\n{n_ok} ok (+{n_resumed} resumed from --done, not re-checked), {n_bad} bad",
          flush=True)
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    skip, done, only, threads, mem = set(), set(), None, None, None
    args = sys.argv[1:]
    outdir, sfdir = args[0], args[1]
    i = 2
    while i < len(args):
        if args[i] == "--skip": skip |= set(args[i + 1].split(",")); i += 2
        elif args[i] == "--only": only = set(args[i + 1].split(",")); i += 2
        elif args[i] == "--threads": threads = int(args[i + 1]); i += 2
        elif args[i] == "--mem": mem = args[i + 1]; i += 2
        elif args[i] == "--done":
            import re
            for ln in open(args[i + 1]):
                m = re.match(r"OK\s+(\S+)", ln)
                if m: done.add(m.group(1))
            i += 2
        else: i += 1
    main(outdir, sfdir, skip, done, only, threads, mem)
