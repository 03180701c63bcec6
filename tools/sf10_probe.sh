#!/bin/bash
# One-off sf10-shape (100x sf0.1) cliff probe (VERDICT r17 #7): run
# the ~10 costliest queries once against the tools/sf10_probe_build.py
# tables and print per-query seconds. NOT a gate — a single-pass probe
# whose table goes in the round notes next to the 10x rehearsal, with
# a note on any superlinear mover (cost ratio vs the committed
# tools/sf1_baseline.json 10x numbers).
set -e
cd "$(dirname "$0")/.."
DIR=${1:-/tmp/graft_sf10probe}
OUT_JSON=${2:-/tmp/graft_sf10_bench.json}
if [ ! -f "$DIR/documents.parquet" ]; then
  python3 tools/sf10_probe_build.py /root/testdata/sf0.1 "$DIR"
fi
QUERIES=${SPARK_GRAFT_QUERIES:-q_source_family,q_pipeline,q_decontam_bloom,q_cell_labels,q_hard_negatives,q_source_overlap,q_containment,q_decontam_semantic,q_winnow,q_media_dedup}
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR="$DIR" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
SPARK_GRAFT_BENCH_PASSES=1 SPARK_GRAFT_QUERIES="$QUERIES" \
java $ADD_OPENS -Xmx64g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench | tee "$OUT_JSON"
python3 - "$OUT_JSON" <<'EOF'
import json, os, sys
cur = json.load(open(sys.argv[1]))
base = json.load(open("tools/sf1_baseline.json"))
print(f"\nsf10-shape probe ({len(cur['queries'])} queries, errors "
      f"{cur.get('errors', 0)}): total {cur['value']:.1f}s")
print(f"{'query':24s} {'10x s':>8s} {'100x s':>8s} {'ratio':>7s}")
for q, t in sorted(cur["queries"].items(), key=lambda kv: -kv[1]):
    b = base["queries"].get(q)
    r = f"{t / b:7.2f}" if b else "    n/a"
    print(f"{q:24s} {b if b else 0:8.2f} {t:8.2f} {r}")
print("(linear at 10x->100x data = ratio ~10; superlinear movers need a note)")
EOF
