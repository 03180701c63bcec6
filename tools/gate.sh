#!/bin/bash
# The standing round gate (r17, extended r18): everything that must be
# green before a round ships, as ONE entry point —
#   compile -> full oracle verify (Verify dump + DuckDB value/type/slow
#   gates) -> the ScalaTest suite -> the sf1-shape 10x regression gate
#   (tools/sf1_baseline.json; >2x shared-surface cost fails) -> the
#   committed full idle-bench snapshot (tools/bench_sf01.json, warns on
#   >2x per-query idle movers).
# ~35 min end to end on this machine. Each stage is runnable alone;
# this script only sequences them and stops at the first red.
# Modes: (no flag) full gate; --reseed  allow a mid-round baseline
# refresh (log it in the round notes); --probe100  run the 100x-shape
# cliff probe (top-10 costliest + $PROBE_EXTRA queries) and exit.
#
# Baseline-reseed policy (VERDICT r17 #5): the sf1 baseline must
# predate the round being gated — a baseline re-seeded mid-round can
# mask exactly the regression the gate exists to catch. If
# tools/sf1_baseline.json was committed at/after this round's first
# non-notes work commit, the gate REFUSES to run unless --reseed is
# passed explicitly; a reseed must be logged in the round notes.
set -e
cd /root/repo
# --probe100 (VERDICT r18 #5, self-extending per r19 #4): run the
# 100x-shape cliff probe as a gate-invocable mode — the standing
# top-10 costliest list (tools/probe_defaults.sh, shared with
# sf10_probe.sh — r19 ADVICE killed the fragile source-text grep)
# PLUS every query registered since the previous round-close commit
# (derived from the QueryDef registrations in git, so new operators
# ride the probe automatically) PLUS anything in PROBE_EXTRA. Each
# query runs in its own JVM (order-independent; see sf10_probe.sh).
# Any superlinear mover still needs a fix or a measured attribution
# in the round notes (the r18 discipline, made standing).
if [ "$1" = "--probe100" ]; then
  . tools/probe_defaults.sh
  if [ -z "$PROBE_BASE_QUERIES" ]; then
    echo "GATE FAIL: tools/probe_defaults.sh yielded an empty PROBE_BASE_QUERIES"
    exit 1
  fi
  LAST_CLOSE=$(git log --grep='^round [0-9]*:' -n1 --format=%H)
  reg_qs() {  # query names registered at a given tree ("" = worktree)
    if [ -n "$1" ]; then
      git grep -ho '"q_[a-z0-9_]*" -> QueryDef' "$1" -- src/main/scala 2>/dev/null
    else
      grep -rho '"q_[a-z0-9_]*" -> QueryDef' src/main/scala
    fi | sed 's/" -> QueryDef//; s/"//' | sort -u
  }
  CUR_QS=$(reg_qs "")
  if [ -z "$CUR_QS" ]; then
    echo "GATE FAIL: no QueryDef registrations found in src/main/scala"
    exit 1
  fi
  NEW_QS=""
  if [ -n "$LAST_CLOSE" ]; then
    NEW_QS=$(comm -13 <(reg_qs "$LAST_CLOSE") <(echo "$CUR_QS") | paste -sd, -)
    [ -n "$NEW_QS" ] && echo "probe100: new since round close ($LAST_CLOSE): $NEW_QS"
  fi
  QS="$PROBE_BASE_QUERIES"
  [ -n "$NEW_QS" ] && QS="$QS,$NEW_QS"
  [ -n "$PROBE_EXTRA" ] && QS="$QS,$PROBE_EXTRA"
  export SPARK_GRAFT_QUERIES="$QS"
  exec tools/sf10_probe.sh "${@:2}"
fi
RESEED=0
[ "$1" = "--reseed" ] && RESEED=1
ROUND_START=$(git log --grep='^round [0-9]*:' -n1 --format=%H)
FIRST_WORK=$(git log --reverse --format='%H %s' ${ROUND_START:+$ROUND_START..HEAD} \
  | grep -v -i ' round notes' | head -1 | cut -d' ' -f1)
BASE_COMMIT=$(git log -n1 --format=%H -- tools/sf1_baseline.json)
if [ "$RESEED" != 1 ] && [ -n "$FIRST_WORK" ] && [ -n "$BASE_COMMIT" ] \
   && git merge-base --is-ancestor "$FIRST_WORK" "$BASE_COMMIT"; then
  echo "GATE REFUSED: tools/sf1_baseline.json was (re)committed this round"
  echo "  (baseline commit $BASE_COMMIT is at/after first work commit $FIRST_WORK)."
  echo "  A mid-round baseline can mask the regression this gate catches."
  echo "  If the reseed is deliberate (post-perf-change refresh), re-run"
  echo "  with: tools/gate.sh --reseed   — and log the reseed in the round notes."
  exit 1
fi
sbt -batch compile
tools/run_verify.sh /root/testdata/sf0.01 /tmp/graft_verify
python3 tools/check.py /root/testdata/sf0.01 /tmp/graft_verify
sbt -batch test
tools/sf1_rehearsal.sh
tools/bench_sf01.sh
echo "ROUND GATE PASS"
