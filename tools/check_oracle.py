#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify (Spark) to dump
each query's result parquet + oracle_sql.json, then run each oracle in DuckDB
over the same sf tables and compare values (columns sorted by name, rows
compared in full). Usage: python3 tools/check_oracle.py <sfDir> <outDir>"""
import json, sys, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracles.items()):
    try:
        got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchall()
        gcols = [d[0] for d in con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet' LIMIT 0").description]
        exp = con.sql(sql).fetchall()
        ecols = [d[0] for d in con.sql(f"SELECT * FROM ({sql}) LIMIT 0").description]
    except Exception as e:
        print(f"FAIL {name}: exception {e}")
        fails += 1
        continue
    if sorted(gcols) != sorted(ecols):
        print(f"FAIL {name}: columns {gcols} vs {ecols}")
        fails += 1
        continue
    # driver sorts columns by name before hashing
    gi = [gcols.index(c) for c in sorted(gcols)]
    ei = [ecols.index(c) for c in sorted(ecols)]
    def norm(v):
        if isinstance(v, float):
            return round(v, 9)
        if isinstance(v, list):
            return tuple(norm(x) for x in v)
        if isinstance(v, dict):
            return tuple(sorted((k, norm(x)) for k, x in v.items()))
        return v
    grows = [tuple(norm(r[i]) for i in gi) for r in got]
    erows = [tuple(norm(r[i]) for i in ei) for r in exp]
    if grows == erows:
        print(f"OK   {name}: {len(grows)} rows")
    elif sorted(map(repr, grows)) == sorted(map(repr, erows)):
        print(f"OK~  {name}: {len(grows)} rows (order differs!)")
    else:
        fails += 1
        print(f"FAIL {name}: {len(grows)} vs {len(erows)} rows")
        sg, se = set(map(repr, grows)), set(map(repr, erows))
        for d in list(sg - se)[:3]:
            print(f"   spark-only: {d[:160]}")
        for d in list(se - sg)[:3]:
            print(f"   oracle-only: {d[:160]}")
print("ALL OK" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
