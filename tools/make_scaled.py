#!/usr/bin/env python3
"""Generate a K×-replicated copy of an sf directory for scale-correctness
sweeps (SURVEY §17): fact tables get K key-shifted copies, dimension tables
stay fixed — the same replication scheme ScaleProbe uses in-memory, but
materialized so BOTH Spark (graft.Verify) and DuckDB (tools/check.py) read
identical inputs one decade above the graded SF.

Usage: python3 tools/make_scaled.py <src_sf_dir> <dst_dir> <K>
  e.g. python3 tools/make_scaled.py /root/testdata/sf0.1 target/sf1x 10

Notes: text/embedding payloads are copied VERBATIM, so every document/vector
gains K-1 identical twins — near-dup pair counts grow ~K² by design (the
worst case for the pair-family queries, which is the point of the sweep);
timestamps are unshifted (duplicated events at the same instant).
"""
import sys
import duckdb

PLAIN = ["region", "nation", "customer", "supplier", "part"]
SHIFTS = {  # table -> (primary key to shift, per-copy span)
    "orders": ("o_orderkey", 10000000),
    "lineitem": ("l_orderkey", 10000000),
    "events": ("event_id", 10000000),
    "documents": ("doc_id", 1000000),
    "embeddings": ("vec_id", 1000000),
}

def main(src, dst, k):
    con = duckdb.connect()
    for t in PLAIN:
        con.sql(f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    for t, (key, span) in SHIFTS.items():
        sel = " UNION ALL ".join(
            f"SELECT * REPLACE (({key} + {i * span}) AS {key}) "
            f"FROM read_parquet('{src}/{t}.parquet')" for i in range(k))
        con.sql(f"COPY ({sel}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    for t in PLAIN + list(SHIFTS):
        n = con.sql(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
        print(t, n)

if __name__ == "__main__":
    import os
    os.makedirs(sys.argv[2], exist_ok=True)
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
