#!/bin/sh
# Round-5 cap-and-cleanup sweep (ROADMAP roofline lever 3): low kernel trip
# caps push the straggler tail to the compacted XLA cleanup
# (ops/compact.py resume_compact, bench BENCH_CLEANUP_W). Each config is a
# full bench.py run (parent watchdog, health gate, fenced stage split), so
# the winner's numbers and cache entries are exactly what the driver's
# BENCH run will reproduce. Widths are grouped so program B (the expensive
# while-march x2 compile) recompiles once per width; ep_cap recompiles only
# program A (~1 min: 9-op co-sort + 3 s kernel).
set -u
LOG=${1:-/tmp/sweep_capcleanup.jsonl}
run() {
  ep=$1; w=$2
  echo "=== ep_cap=$ep cleanup_w=$w ===" >> "$LOG"
  BENCH_STAGE0=0 BENCH_EP_CAP="$ep" BENCH_CLEANUP_W="$w" \
    BENCH_DEADLINE_SEC=1500 timeout 1600 python3 bench.py 2>&1 \
    | grep -E '"metric"|"event"' | tail -4 >> "$LOG"
}
run 384 32768   # control: cleanup path present but cap loose (B compile)
run 48 32768
run 32 32768
run 24 32768
run 64 16384
run 32 65536
echo DONE >> "$LOG"
