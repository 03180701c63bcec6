#!/usr/bin/env python3
"""sf1-shape regression gate (VERDICT r16 next-round #5).

r16 ran the 10x rehearsal by hand; a 10x-scale regression should fail
a GATE, not wait for a judge. Compares a fresh sf1-shape bench JSON
(graft.Bench output at the sf1_shape_build.py tables) against the
committed per-query baseline `tools/sf1_baseline.json` on the SHARED
query surface (intersection of keys, so adding/removing operators
never trips the gate by itself) and exits nonzero when:

  - the shared-surface total exceeds 2x the baseline total, or
  - the bench itself reported errors.

On pass, prints the shared-surface ratio and the worst per-query
movers (attribution, not gating — single-pass 10x numbers carry
pass-to-pass noise; the 2x total bound is the honest cliff detector).

Bootstrap: if the baseline file does not exist, the current run is
written as the baseline and the gate passes with a note — commit the
file so the NEXT round is gated.

Usage: sf1_gate.py <bench_json_path> [baseline_path]
"""
import json
import os
import sys

BENCH = sys.argv[1]
BASE = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    os.path.dirname(__file__), "sf1_baseline.json")

cur = json.load(open(BENCH))
if cur.get("errors", 0):
    print(f"SF1 GATE FAIL: bench reported {cur['errors']} errored queries")
    sys.exit(1)

if not os.path.exists(BASE):
    json.dump(cur, open(BASE, "w"))
    print(f"SF1 GATE: no baseline at {BASE} — wrote current run "
          f"(total {cur['value']:.1f}s over {len(cur['queries'])} queries); "
          f"commit it to arm the gate")
    sys.exit(0)

base = json.load(open(BASE))
shared = sorted(set(cur["queries"]) & set(base["queries"]))
if not shared:
    print("SF1 GATE FAIL: no shared queries between run and baseline")
    sys.exit(1)

cur_t = sum(cur["queries"][q] for q in shared)
base_t = sum(base["queries"][q] for q in shared)
ratio = cur_t / base_t if base_t > 0 else float("inf")

movers = sorted(
    ((cur["queries"][q] - base["queries"][q], q) for q in shared), reverse=True)
print(f"sf1-shape shared surface ({len(shared)} queries): "
      f"{base_t:.1f}s -> {cur_t:.1f}s ({ratio:.2f}x)")
print("worst movers (s):")
for d, q in movers[:8]:
    print(f"  {d:+7.2f}  {q}  ({base['queries'][q]:.2f} -> {cur['queries'][q]:.2f})")

if ratio > 2.0:
    print(f"SF1 GATE FAIL: shared-surface total regressed {ratio:.2f}x (> 2x)")
    sys.exit(1)
print("SF1 GATE PASS")
