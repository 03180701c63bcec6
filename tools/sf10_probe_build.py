#!/usr/bin/env python3
"""Build a 100x-of-sf0.1 ("sf10-shape") probe copy of the THREE
largest tables only (VERDICT r17 next-round #7): documents, events,
embeddings at K=99 copies with the same copy discipline as
sf1_shape_build.py (word permutations / dimension rotations / shifted
event copies, ids at +1_000_000*k — clear of ALL planted ranges: the
+200000/+300000 text near-dups, the +400000 containment excerpts,
and the +600000/+900000 media re-encodes), plus as-is copies of the small tables so Tables()
resolves everything the probed queries' memo warmers touch. The
per-block doc_id headroom (base doc_id < 100_000) is asserted at
build time, same as sf1_shape_build.py.

This is a ONE-OFF cliff probe, not a gate: run the ~10 costliest
queries once via tools/sf10_probe.sh and record the table + any
superlinear mover in the round notes.

Usage: python3 tools/sf10_probe_build.py [src_sf_dir] [out_dir]
Defaults: /root/testdata/sf0.1 /tmp/graft_sf10probe
"""
import duckdb
import os
import shutil
import sys
import time

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf10probe"
K = 99
OFF = 1_000_000

con = duckdb.connect()
os.makedirs(OUT, exist_ok=True)


def build(name, sql):
    target = f"{OUT}/{name}.parquet"
    if os.path.exists(target):
        print(f"{name}: exists, skipping", flush=True)
        return
    t0 = time.time()
    con.execute(f"COPY ({sql}) TO '{target}' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{target}')").fetchone()[0]
    print(f"{name}: {n} rows in {time.time() - t0:.1f}s", flush=True)


def src(name):
    return f"read_parquet('{SRC}/{name}.parquet')"


# Per-block doc_id headroom assert (r19 ADVICE) — see sf1_shape_build.py.
_max_id = con.execute(
    f"SELECT max(doc_id % {OFF}) FROM {src('documents')}").fetchone()[0]
assert _max_id < 100_000, (
    f"doc_id headroom violated: max base doc_id % {OFF} = {_max_id} >= 100000 — "
    "planted id ranges (+200k/+300k/+400k/+600k/+900k) would collide")

build("documents", f"""
  WITH base AS (SELECT * FROM {src('documents')}),
  tok AS (
    SELECT b.doc_id, g.k, b.lang, b.source, b.n_chars,
      unnest(string_split(b.text, ' ')) AS w,
      unnest(generate_series(1, len(string_split(b.text, ' ')))) AS i
    FROM base b CROSS JOIN generate_series(1, {K}) g(k)),
  perm AS (
    SELECT doc_id + {OFF} * k AS doc_id,
      string_agg(w, ' ' ORDER BY md5(w || ':' || CAST(i AS VARCHAR)
                                       || ':' || CAST(k AS VARCHAR))) AS text,
      min(lang) AS lang, min(source) AS source, min(n_chars) AS n_chars
    FROM tok GROUP BY doc_id, k)
  SELECT doc_id, text, lang, source, n_chars FROM base
  UNION ALL
  SELECT doc_id, text, lang, source, n_chars FROM perm
  ORDER BY doc_id""")

build("embeddings", f"""
  WITH base AS (SELECT * FROM {src('embeddings')}),
  dims AS (SELECT len(embedding) AS d FROM base LIMIT 1),
  rot AS (
    SELECT b.vec_id + {OFF} * g.k AS vec_id,
      CAST(list_transform(generate_series(1, dims.d),
        i -> b.embedding[((i - 1 + g.k * 7) % dims.d) + 1]) AS FLOAT[]) AS embedding,
      b.label
    FROM base b CROSS JOIN generate_series(1, {K}) g(k) CROSS JOIN dims)
  SELECT vec_id, embedding, label FROM base
  UNION ALL
  SELECT vec_id, embedding, label FROM rot
  ORDER BY vec_id""")

build("events", f"""
  WITH base AS (SELECT * FROM {src('events')}),
  cp AS (
    SELECT b.event_id + {OFF} * g.k AS event_id,
      b.ts + to_seconds(g.k) AS ts,
      b.user_id + {OFF} * g.k AS user_id,
      b.event_type, b.value, b.props
    FROM base b CROSS JOIN generate_series(1, {K}) g(k))
  SELECT event_id, ts, user_id, event_type, value, props FROM base
  UNION ALL
  SELECT event_id, ts, user_id, event_type, value, props FROM cp
  ORDER BY event_id""")

for small in ["lineitem", "orders", "customer", "supplier", "part",
              "region", "nation"]:
    target = f"{OUT}/{small}.parquet"
    if not os.path.exists(target):
        shutil.copyfile(f"{SRC}/{small}.parquet", target)
        print(f"{small}: copied as-is", flush=True)

print("done", flush=True)
