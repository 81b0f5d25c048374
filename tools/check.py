#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfdir> <verify_out_dir> [only_csv] [skip_csv]
Registers each parquet table as a DuckDB view, runs every oracle_sql.json
entry, and compares against the Spark-written parquet in <verify_out_dir>/<q>:
column names (sorted), row count, and a hash of the value matrix after
sorting columns by name and rows lexicographically. Floats rounded to 6dp
before hashing (the Spark side should already round aggregates explicitly).

Results print INCREMENTALLY (one line per query, flushed) so a crash or kill
mid-run loses nothing; DuckDB gets all threads plus a memory limit with
spill-to-disk, which the quadratic ground-truth oracles (brute ANN pairs at
10x data = ~13G join rows) need to finish instead of OOMing. only_csv /
skip_csv restrict the query set for targeted or split runs.
"""
import sys, json, glob, hashlib, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> tuple:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype.kind == 'f':
            df[c] = df[c].round(6)
        if str(df[c].dtype).startswith('datetime'):
            df[c] = df[c].astype('datetime64[us]')
    rows = sorted(tuple(str(v) for v in r) for r in df.itertuples(index=False))
    h = hashlib.md5(repr(rows).encode()).hexdigest()
    return tuple(df.columns), len(rows), h, rows[:3]

def main(sfdir, outdir, only=None, skip=None):
    con = duckdb.connect()
    con.sql(f"SET threads={os.cpu_count()}")
    con.sql("SET memory_limit='80GB'")
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    for p in glob.glob(f"{sfdir}/*.parquet"):
        name = p.split("/")[-1].replace(".parquet", "")
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    if only:
        missing = only - set(oracle)
        if missing:  # a typo'd filter must not become a silent 0/0 pass
            print(f"== ERROR: only-names not in oracle_sql.json: {sorted(missing)} ==")
            return 1
        oracle = {q: s for q, s in oracle.items() if q in only}
    if skip:
        oracle = {q: s for q, s in oracle.items() if q not in skip}
    if not oracle:
        print("== ERROR: query filter left nothing to check — refusing a 0/0 'pass' ==")
        return 1
    width = max(len(q) for q in oracle) if oracle else 0
    results = {}
    for q, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            results[q] = f"ORACLE-ERROR {e}"
            print(f"{q:<{width}}  {results[q][:400]}", flush=True)
            continue
        try:
            got = pd.read_parquet(f"{outdir}/{q}")
        except Exception as e:
            results[q] = f"SPARK-MISSING {e}"
            print(f"{q:<{width}}  {results[q][:400]}", flush=True)
            continue
        ce, ne, he, se = canon(exp)
        cg, ng, hg, sg = canon(got)
        if ce != cg:
            results[q] = f"SCHEMA-MISMATCH oracle={ce} spark={cg}"
        elif ne != ng:
            results[q] = f"ROWCOUNT-MISMATCH oracle={ne} spark={ng}"
        elif he != hg:
            results[q] = f"HASH-MISMATCH n={ne} oracle_head={se} spark_head={sg}"
        else:
            results[q] = f"OK n={ne}"
        print(f"{q:<{width}}  {results[q][:400]}", flush=True)
    ok = sum(1 for v in results.values() if v.startswith("OK"))
    print(f"== {ok}/{len(results)} OK ==", flush=True)
    return 0 if ok == len(results) else 1

if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 and sys.argv[3] else None
    skip = set(sys.argv[4].split(",")) if len(sys.argv) > 4 and sys.argv[4] else None
    sys.exit(main(sys.argv[1], sys.argv[2], only, skip))
