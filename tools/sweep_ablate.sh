#!/bin/sh
# Where do program A's ~60 ms (flat kernel) actually go? BM_ABL ablations
# (timing-only, wrong results) + the unswept flat_coarse=False candidate.
# One process per BM_ABL value (the flag is read at trace time).
set -u
LOG=${1:-/tmp/sweep_abl.jsonl}
one() {
  abl=$1
  echo "=== BM_ABL=$abl ===" >> "$LOG"
  BM_ABL="$abl" SWEEP_R5='[{"flat": true}]' BENCH_ITERS=5 \
    timeout 900 python3 tools/sweep_r5.py 2>/dev/null \
    | grep -E '"A_ms"|error' >> "$LOG"
}
one ""
one "nocell"
one "nocoarse"
one "nomat"
one "norng"
one "nocell,nocoarse,nomat,norng"
echo "=== flat_coarse=False + tiles ===" >> "$LOG"
SWEEP_R5='[{"flat": true, "flat_coarse": false}, {"flat": true, "tile": 1024}, {"flat": true, "tile": 4096}, {"flat": true, "tile": 8192}, {"flat": true, "inner_cap": 1}, {"flat": true, "inner_cap": 4}, {"flat": true, "pages": 2}]' \
  BENCH_ITERS=5 timeout 1800 python3 tools/sweep_r5.py 2>/dev/null \
  | grep -E '"A_ms"|error' >> "$LOG"
echo DONE >> "$LOG"
