#!/bin/bash
# The standing round gate (r17): everything that must be green before
# a round ships, as ONE entry point —
#   compile -> full oracle verify (Verify dump + DuckDB value/type/slow
#   gates) -> the ScalaTest suite -> the sf1-shape 10x regression gate
#   (tools/sf1_baseline.json; >2x shared-surface cost fails).
# ~30 min end to end on this machine. Each stage is runnable alone;
# this script only sequences them and stops at the first red.
set -e
cd /root/repo
sbt -batch compile
tools/run_verify.sh /root/testdata/sf0.01 /tmp/graft_verify
python3 tools/check.py /root/testdata/sf0.01 /tmp/graft_verify
sbt -batch test
tools/sf1_rehearsal.sh
echo "ROUND GATE PASS"
