#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same sfDir
parquet tables, and compares: column names (sorted), row count, and values
(rows sorted by all columns). Exit 1 on any mismatch.
"""
import json
import math
import sys

import duckdb


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def norm(df):
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return cols, sorted(rows)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = []
    for name, sql in sorted(oracles.items()):
        try:
            got = duckdb.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            failures.append((name, f"spark result unreadable: {e}"))
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            failures.append((name, f"oracle SQL failed: {e}"))
            continue
        gc, gr = norm(got)
        wc, wr = norm(want)
        if gc != wc:
            failures.append((name, f"columns differ: spark={gc} oracle={wc}"))
            continue
        if len(gr) != len(wr):
            failures.append((name, f"row count differs: spark={len(gr)} oracle={len(wr)}"))
            continue
        bad = [(a, b) for a, b in zip(gr, wr) if a != b]
        if bad:
            failures.append((name, f"{len(bad)} differing rows; first: spark={bad[0][0]} oracle={bad[0][1]}"))
            continue
        print(f"  OK {name}: {len(gr)} rows")
    if failures:
        for name, msg in failures:
            print(f"FAIL {name}: {msg}")
        sys.exit(1)
    print(f"all {len(oracles)} queries match")


if __name__ == "__main__":
    main()
