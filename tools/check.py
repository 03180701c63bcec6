#!/usr/bin/env python3
"""Local stand-in for the driver's t2 compare: for each query output in
OUT_DIR, run its oracle SQL in DuckDB over the same sf tables, sort
columns by name, and compare cell-by-cell (exact; floats must match
after the query's own round(_, 4)).

Usage: check.py [sf_dir] [out_dir] [only_query ...]
"""
import json, struct, sys, math
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
ONLY = set(sys.argv[3:])

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        # Bit-exact, like the driver's hash compare: -0.0 != 0.0 and all
        # NaN payloads collapse to one canonical NaN. Python == would
        # treat -0.0 == 0.0 as equal and let a driver-red result pass.
        if math.isnan(v):
            return "NaN"
        return struct.pack(">d", v)
    return v

fails, passes = [], 0
for name, sql in sorted(oracle.items()):
    if ONLY and name not in ONLY:
        continue
    try:
        spark_rel = con.sql(f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')")
        spark_cols = sorted(spark_rel.columns)
        spark_rows = con.sql(
            f"SELECT {', '.join(spark_cols)} FROM spark_rel").fetchall()
        duck_rel = con.sql(sql)
        duck_cols = sorted(duck_rel.columns)
        duck_rows = con.sql(
            f"SELECT {', '.join(duck_cols)} FROM duck_rel").fetchall()
    except Exception as e:
        fails.append((name, f"ERROR {e}"))
        continue
    if spark_cols != duck_cols:
        fails.append((name, f"schema: spark={spark_cols} duck={duck_cols}"))
        continue
    if len(spark_rows) != len(duck_rows):
        fails.append((name, f"rows: spark={len(spark_rows)} duck={len(duck_rows)}"))
        continue
    bad = None
    for i, (a, b) in enumerate(zip(spark_rows, duck_rows)):
        ca, cb = tuple(map(canon, a)), tuple(map(canon, b))
        if ca != cb:
            bad = f"row {i}: spark={a} duck={b} (cols={spark_cols})"
            break
    if bad:
        fails.append((name, bad))
    else:
        passes += 1
        print(f"PASS {name} ({len(spark_rows)} rows)")

for name, msg in fails:
    print(f"FAIL {name}: {msg}")
print(f"\n{passes} pass, {len(fails)} fail")
sys.exit(1 if fails else 0)
