#!/bin/sh
# Round-5 supersteps-under-flat sweep. The CPU survival curve shows every
# stock ray finishes within ~48 march steps, so program A's 60 ms is NOT
# ray-length imbalance — it is page-rotation stalls (lanes waiting for
# their chunk page to win the per-group vote). The superstep co-sort
# regroups survivors by (stall desc, needed page) across tiles, which is
# the direct counter; it was only ever measured pre-flat (round 4, -25%).
# cleanup_w stays 0: program B (cached) is untouched, each config
# recompiles only program A.
set -u
LOG=${1:-/tmp/sweep_ss.jsonl}
run() {
  ss=$1; ep=$2; extra_env=$3
  echo "=== supersteps=$ss ep_cap=$ep $extra_env ===" >> "$LOG"
  env BENCH_STAGE0=0 BENCH_SUPERSTEPS="$ss" BENCH_EP_CAP="$ep" $extra_env \
    BENCH_DEADLINE_SEC=1200 timeout 1300 python3 bench.py 2>&1 \
    | grep -E '"metric"' | tail -1 >> "$LOG"
}
run 2 192 ""
run 4 96 ""
run 4 96 "BENCH_RESORT_LIFE=1"
run 8 48 ""
run 4 96 "BENCH_TILE=8192"
echo DONE >> "$LOG"
