#!/usr/bin/env python3
"""Build an sf1-SHAPED copy of EVERY testdata table (VERDICT r13
next-round #6: full-surface sf1 bench rehearsal, not just the worst-3
document queries).

10x the rows of the source SF with the key discipline of the r11/r12
documents rehearsal generalized per table family:

- documents: sf0.1 + 9 per-copy deterministic word PERMUTATIONS per doc
  (same vocabulary/length/source distributions; permutation destroys
  trigram shingles so copies are NOT artificial near-dups). Copy ids at
  doc_id + 1_000_000*k, clear of ALL planted id ranges: the text
  near-dup plants at +200000/+300000, the containment excerpts at
  +400000, AND the media re-encode plants at +600000/+900000
  (Multimodal.videoContainers). The whole scheme rests
  on per-block doc_id headroom — every base doc_id must stay below
  100_000 so block k's real ids [1e6*k, 1e6*k+100k) can never collide
  with any plant family ([+200k,+300k), [+300k,+400k), [+400k,+500k),
  [+600k,+700k), [+900k,+1000k)) nor the plant families with each other; a denser
  future corpus would merge plant fingerprint sets IDENTICALLY on both
  engines, invisible to the oracle. Asserted below at build time.
- embeddings: + 9 per-copy cyclic DIMENSION ROTATIONS per vector (same
  norm and value distribution; rotation decorrelates cosine, so copies
  are not artificial embedding near-dups — the vector analog of the
  word permutation). vec_id 0 (query) and 1..8 (centroid/codebook
  config rows) stay unique originals; copies ride vec_id + 1_000_000*k.
- events: + 9 copies at event_id + 1_000_000*k, user_id + 1_000_000*k
  (distinct users keep per-user session/asof volumes realistic instead
  of stacking 10 identical timelines on one user), ts shifted +k
  seconds (breaks exact-ts ties across copies).
- lineitem/orders/customer/supplier/part: + 9 copies with ALL join keys
  offset by +1_000_000*k consistently (custkey, orderkey, partkey,
  suppkey), so referential joins stay 1:1 per copy — the volume grows
  10x, the join fan-out per key does not (which is what real growth
  looks like).
- region/nation: true dimensions, copied as-is.

Usage: python3 tools/sf1_shape_build.py [src_sf_dir] [out_dir]
Defaults: /root/testdata/sf0.1 /tmp/graft_sf1full
"""
import duckdb
import os
import sys
import time

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1full"
K = 9
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


# Per-block doc_id headroom assert (r19 ADVICE): the +1_000_000*k copy
# blocks AND every planted id family (+200k/+300k text near-dups,
# +600k/+900k media re-encodes) assume base doc_ids < 100_000. A denser
# source corpus would let plant ids collide with real ids (or plant
# families with each other) identically on both engines — a silent
# fingerprint-set merge the oracle could never catch. Fail the BUILD
# instead.
_max_id = con.execute(
    f"SELECT max(doc_id % {OFF}) FROM {src('documents')}").fetchone()[0]
assert _max_id < 100_000, (
    f"doc_id headroom violated: max base doc_id % {OFF} = {_max_id} >= 100000 — "
    "planted id ranges (+200k/+300k/+400k/+600k/+900k) would collide; "
    "re-plan the plant offsets before building")

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

build("lineitem", f"""
  WITH base AS (SELECT * FROM {src('lineitem')}),
  cp AS (
    SELECT l_orderkey + {OFF} * g.k AS l_orderkey,
      l_partkey + {OFF} * g.k AS l_partkey,
      l_suppkey + {OFF} * g.k AS l_suppkey,
      l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
      l_returnflag, l_linestatus, l_shipdate
    FROM base CROSS JOIN generate_series(1, {K}) g(k))
  SELECT * FROM base UNION ALL SELECT * FROM cp ORDER BY l_orderkey, l_linenumber""")

build("orders", f"""
  WITH base AS (SELECT * FROM {src('orders')}),
  cp AS (
    SELECT o_orderkey + {OFF} * g.k AS o_orderkey,
      o_custkey + {OFF} * g.k AS o_custkey,
      o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
    FROM base CROSS JOIN generate_series(1, {K}) g(k))
  SELECT * FROM base UNION ALL SELECT * FROM cp ORDER BY o_orderkey""")

build("customer", f"""
  WITH base AS (SELECT * FROM {src('customer')}),
  cp AS (
    SELECT c_custkey + {OFF} * g.k AS c_custkey,
      c_name || '#' || CAST(g.k AS VARCHAR) AS c_name,
      c_nationkey, c_acctbal, c_mktsegment
    FROM base CROSS JOIN generate_series(1, {K}) g(k))
  SELECT * FROM base UNION ALL SELECT * FROM cp ORDER BY c_custkey""")

build("supplier", f"""
  WITH base AS (SELECT * FROM {src('supplier')}),
  cp AS (
    SELECT s_suppkey + {OFF} * g.k AS s_suppkey,
      s_name || '#' || CAST(g.k AS VARCHAR) AS s_name,
      s_nationkey, s_acctbal
    FROM base CROSS JOIN generate_series(1, {K}) g(k))
  SELECT * FROM base UNION ALL SELECT * FROM cp ORDER BY s_suppkey""")

build("part", f"""
  WITH base AS (SELECT * FROM {src('part')}),
  cp AS (
    SELECT p_partkey + {OFF} * g.k AS p_partkey,
      p_name || '#' || CAST(g.k AS VARCHAR) AS p_name,
      p_brand, p_type, p_size, p_retailprice
    FROM base CROSS JOIN generate_series(1, {K}) g(k))
  SELECT * FROM base UNION ALL SELECT * FROM cp ORDER BY p_partkey""")

build("region", f"SELECT * FROM {src('region')}")
build("nation", f"SELECT * FROM {src('nation')}")

print("done", flush=True)
