#!/usr/bin/env python3
"""sf1 oracle-cost rehearsal (VERDICT r11 next-round #5).

The three most expensive DuckDB oracle CTE chains — the X5a shingle
chain (q_dedup_near), the simhash probe-explode (q_dedup_simhash) and
the unrolled BPE loop (q_bpe_merges) — were flagged in-code as a
"verify-timeout risk at sf1". This script builds an sf1-SHAPED corpus
locally (sf0.1's documents plus 9 hash-permuted copies each: same
vocabulary/length/source distributions, 10x the rows, WITHOUT turning
the copies into near-duplicates — a per-copy deterministic word
permutation destroys the trigram shingles while keeping everything
else), then times each oracle against it.

Usage: python3 tools/oracle_sf1_rehearsal.py \
         [src_sf_dir] [out_dir] [oracle_sql.json]
Defaults: /root/testdata/sf0.1 /tmp/graft_sf1 /tmp/graft_verify/oracle_sql.json
(the oracle_sql.json is what graft.Verify dumps — run tools/run_verify.sh first).

Copy ids ride at doc_id + 1_000_000*k so the dedup oracles' planted
+200000 derivation can never collide with a copy id.
"""
import duckdb
import json
import os
import sys
import time

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
ORACLES = sys.argv[3] if len(sys.argv) > 3 else "/tmp/graft_verify/oracle_sql.json"
QUERIES = ["q_dedup_near", "q_dedup_simhash", "q_bpe_merges"]

con = duckdb.connect()
os.makedirs(OUT, exist_ok=True)
target = f"{OUT}/documents.parquet"
if not os.path.exists(target):
    t0 = time.time()
    con.execute(f"""
    COPY (
      WITH base AS (
        SELECT doc_id, text, lang, source, n_chars
        FROM read_parquet('{SRC}/documents.parquet')),
      tok AS (
        SELECT b.doc_id, g.k, b.lang, b.source, b.n_chars,
          unnest(string_split(b.text, ' ')) AS w,
          unnest(generate_series(1, len(string_split(b.text, ' ')))) AS i
        FROM base b CROSS JOIN generate_series(1, 9) g(k)),
      perm AS (
        SELECT doc_id + 1000000 * k AS doc_id,
          string_agg(w, ' ' ORDER BY md5(w || ':' || CAST(i AS VARCHAR)
                                           || ':' || CAST(k AS VARCHAR))) AS text,
          min(lang) AS lang, min(source) AS source, min(n_chars) AS n_chars
        FROM tok GROUP BY doc_id, k)
      SELECT doc_id, text, lang, source, n_chars FROM base
      UNION ALL
      SELECT doc_id, text, lang, source, n_chars FROM perm
      ORDER BY doc_id
    ) TO '{target}' (FORMAT PARQUET)
    """)
    print(f"built {target} in {time.time() - t0:.1f}s", flush=True)

n = con.execute(f"SELECT count(*) FROM read_parquet('{target}')").fetchone()[0]
print(f"corpus rows: {n}", flush=True)
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{target}')")
oracles = json.load(open(ORACLES))
for q in QUERIES:
    t0 = time.time()
    rows = len(con.execute(oracles[q]).fetchall())
    print(f"{q}: {time.time() - t0:.1f}s, {rows} rows", flush=True)
