#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify at a
given SF dir, then execute each oracle SQL in DuckDB over the same parquet
tables and compare rows / schema / value-hash (columns sorted by name, rows
sorted by all columns, values rounded via repr) against the Spark parquet
output. Usage: python3 tools/check_oracles.py [sfdir] [outdir] [--skip-verify]
"""
import sys, json, subprocess, glob, os
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"
skip = "--skip-verify" in sys.argv

if not skip:
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {sfdir} {outdir}'],
        cwd="/root/repo", env=env, capture_output=True, text=True, timeout=1800)
    if r.returncode != 0:
        print(r.stdout[-3000:]); print(r.stderr[-2000:]); sys.exit(1)
    for line in r.stdout.splitlines():
        if "[verify]" in line: print(line)

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
names = sorted(os.path.basename(p) for p in glob.glob(f"{outdir}/q_*"))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append(tuple(repr(row[i]) for i in order))
    return sorted(out)

def canon_types(rel):
    # DuckDB fetchall() collapses HUGEINT/INT/BIGINT to Python int, so repr
    # comparison alone is blind to the type mismatches the driver gate
    # detects (e.g. un-cast integer sum() -> HUGEINT vs Spark BIGINT).
    return [str(t) for _, t in sorted(zip(rel.columns, rel.types))]

fails = []
for name in names:
    spark_rel = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
    scols, srows = spark_rel.columns, spark_rel.fetchall()
    if name not in oracle:
        print(f"{name:24s} NO_ORACLE  spark_rows={len(srows)}")
        fails.append(name)
        continue
    try:
        orel = con.sql(oracle[name])
        ocols, orows = orel.columns, orel.fetchall()
    except Exception as e:
        print(f"{name:24s} ORACLE_ERR {str(e)[:160]}")
        fails.append(name); continue
    ok_rows = len(srows) == len(orows)
    ok_schema = sorted(scols) == sorted(ocols)
    ok_types = canon_types(spark_rel) == canon_types(orel)
    ok_hash = (ok_rows and ok_schema and ok_types
               and canon(srows, scols) == canon(orows, ocols))
    status = "OK" if ok_hash else "FAIL"
    print(f"{name:24s} {status:5s} rows={len(srows)}/{len(orows)} "
          f"schema={ok_schema} types={ok_types}")
    if not ok_types:
        print(f"    spark types={canon_types(spark_rel)}")
        print(f"    orcle types={canon_types(orel)}")
    if not ok_hash:
        fails.append(name)
        if ok_rows and ok_schema:
            a, b = canon(srows, scols), canon(orows, ocols)
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            for x, y in diff: print(f"    spark={x}\n    orcle={y}")
print(f"\n{len(names)-len(fails)}/{len(names)} pass; fails: {fails}")
sys.exit(1 if fails else 0)
