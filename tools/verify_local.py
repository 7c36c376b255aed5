#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output
parquet under OUTDIR, run the matching oracle SQL in DuckDB against the
sf tables and compare (schema-insensitive: columns sorted by name, rows
sorted, values hashed). Usage: verify_local.py [sfdir] [outdir]."""
import json
import math
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out


ok = fail = 0
for name, sql in sorted(oracle.items()):
    try:
        spark_rel = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'")
        scols = spark_rel.columns
        srows = spark_rel.fetchall()
        orel = con.sql(sql)
        ocols = orel.columns
        orows = orel.fetchall()
        sc, sr = canon(srows, scols)
        oc, orr = canon(orows, ocols)
        if sc != oc:
            print(f"FAIL {name}: columns {sc} vs {oc}")
            fail += 1
        elif sr != orr:
            diffs = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
            print(f"FAIL {name}: rows {len(sr)} vs {len(orr)}; first diffs: {diffs}")
            if len(sr) != len(orr):
                print(f"  spark[:2]={sr[:2]}  oracle[:2]={orr[:2]}")
            fail += 1
        else:
            print(f"ok   {name} ({len(sr)} rows)")
            ok += 1
    except Exception as e:
        print(f"ERR  {name}: {e}")
        fail += 1

# rows-only queries (no oracle): check non-empty
import glob
import os
for p in sorted(glob.glob(f"{OUT}/*/")):
    name = os.path.basename(p.rstrip("/"))
    if name in oracle:
        continue
    try:
        n = con.sql(f"SELECT count(*) FROM '{OUT}/{name}/*.parquet'").fetchone()[0]
        print(f"rows {name}: {n} rows {'ok' if n > 0 else 'EMPTY!'}")
    except Exception as e:
        print(f"ERR  {name}: {e}")

print(f"\n{ok} ok, {fail} fail of {len(oracle)} oracled")
