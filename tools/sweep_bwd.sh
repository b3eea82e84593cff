#!/bin/sh
# Backward-tile sweep: program C (fused Pallas replay grad,
# ops/replay_block.py) across lane-tile widths. A and B reuse the winner
# config's cached programs; only the bwd kernel recompiles (~seconds,
# resident-style straight-line body).
set -u
LOG=${1:-/tmp/sweep_bwd.jsonl}
EP=${2:-384}
W=${3:-0}
for t in 1024 4096 8192; do
  echo "=== bwd_tile=$t (ep_cap=$EP cleanup_w=$W) ===" >> "$LOG"
  BENCH_STAGE0=0 BENCH_EP_CAP="$EP" BENCH_CLEANUP_W="$W" BENCH_BWD_TILE="$t" \
    BENCH_DEADLINE_SEC=1200 timeout 1300 python3 bench.py 2>&1 \
    | grep -E '"metric"' | tail -1 >> "$LOG"
done
echo DONE >> "$LOG"
