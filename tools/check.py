#!/usr/bin/env python3
"""Local stand-in for the driver's t2 compare: for each query output in
OUT_DIR, run its oracle SQL in DuckDB over the same sf tables, sort
columns by name, and compare cell-by-cell (exact; floats must match
after the query's own round(_, 4)).

Usage: check.py [--times] [sf_dir] [out_dir] [only_query ...]

The gate FAILS if any single oracle exceeds SLOW_ORACLE_SEC (10 s) — the
class of regression that silently blew the r14 driver budget — and if any
oracle column's type is int128-class or mismatches the Spark result's
width class (the r15 driver hash-fail class). --times additionally prints
per-query oracle wall time and a sorted cost table.
"""
import json, struct, sys, math, time
import duckdb

argv = [a for a in sys.argv[1:] if a != "--times"]
TIMES = "--times" in sys.argv[1:]
SLOW_ORACLE_SEC = 10.0

SF = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
OUT = argv[1] if len(argv) > 1 else "/tmp/graft_verify"
ONLY = set(argv[2:])

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

# Driver-hash type parity (r15 lesson): the driver's hash is TYPE-sensitive
# by WIDTH CLASS. DuckDB silently widens sum(BIGINT) -> HUGEIN T (int128),
# which hash-fails against Spark's BIGINT even when every cell value matches
# — check.py's value compare alone cannot see it. Evidence for the class
# boundary: q_coreset shipped INTEGER (oracle) vs BIGINT (spark) and passed
# the driver, so all int64-representable int widths canonicalize alike;
# only int128 (HUGEINT / DECIMAL) does not. Gate: (a) no oracle column may
# be int128-class, and (b) each oracle column's width class must equal the
# Spark column's.

def type_class(t):
    s = str(t).upper()
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"):
        return "INT64"
    if s == "HUGEINT" or s == "UBIGINT" or s.startswith("DECIMAL"):
        return "INT128"
    if s.startswith("TIMESTAMP"):  # TZ flavor differs by writer, hash doesn't
        return "TIMESTAMP"
    return s  # DOUBLE, FLOAT, VARCHAR, BOOLEAN, DATE, LIST(...), ... exact

def type_parity(name, spark_rel, duck_rel):
    """Return an error string if any oracle column's type would trip the
    driver's type-sensitive hash, else None."""
    spark_t = {c: type_class(t) for c, t in zip(spark_rel.columns, spark_rel.types)}
    duck_t = {c: type_class(t) for c, t in zip(duck_rel.columns, duck_rel.types)}
    errs = []
    for c in sorted(duck_t):
        dt = duck_t[c]
        st = spark_t.get(c)
        if dt == "INT128":
            errs.append(f"{c}: oracle type is int128-class (HUGEINT/DECIMAL) — "
                        f"driver hash-fails even on equal values; CAST to BIGINT")
        elif st is not None and dt != st:
            errs.append(f"{c}: oracle class {dt} != spark class {st}")
    return "; ".join(errs) if errs else None

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

fails, passes, costs = [], 0, []
for name, sql in sorted(oracle.items()):
    if ONLY and name not in ONLY:
        continue
    try:
        spark_rel = con.sql(f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')")
        spark_cols = sorted(spark_rel.columns)
        spark_rows = con.sql(
            f"SELECT {', '.join(spark_cols)} FROM spark_rel").fetchall()
        # Time only the DuckDB oracle: the SLOW ORACLE gate must not be
        # tripped (or padded) by fetching a large Spark result set.
        t0 = time.monotonic()
        duck_rel = con.sql(sql)
        duck_cols = sorted(duck_rel.columns)
        duck_rows = con.sql(
            f"SELECT {', '.join(duck_cols)} FROM duck_rel").fetchall()
    except Exception as e:
        fails.append((name, f"ERROR {e}"))
        continue
    costs.append((time.monotonic() - t0, name))
    if spark_cols != duck_cols:
        fails.append((name, f"schema: spark={spark_cols} duck={duck_cols}"))
        continue
    tp = type_parity(name, spark_rel, duck_rel)
    if tp:
        fails.append((name, f"type-parity: {tp}"))
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
        t = f" [{costs[-1][0]:6.2f}s]" if TIMES else ""
        print(f"PASS {name} ({len(spark_rows)} rows){t}")

for name, msg in fails:
    print(f"FAIL {name}: {msg}")

# The slow-oracle gate is MANDATORY (r15 ADVICE): materializeShared
# counts table positions (r17), but a reference form that slips past
# the scanner UNDER-counts and the resulting inline cliff is only
# caught by timing — an opt-in gate misses it. --times now only
# controls the printed cost table.
slow = [(t, n) for t, n in costs if t > SLOW_ORACLE_SEC]
if TIMES:
    print(f"\n-- oracle cost (total {sum(t for t, _ in costs):.1f}s) --")
    for t, n in sorted(costs, reverse=True)[:20]:
        print(f"{t:7.2f}s  {n}")
for t, n in slow:
    print(f"SLOW ORACLE (> {SLOW_ORACLE_SEC:.0f}s): {n} took {t:.2f}s")

print(f"\n{passes} pass, {len(fails)} fail")
sys.exit(1 if fails or slow else 0)
