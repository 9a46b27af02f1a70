#!/bin/bash
# Round-4 chip queue: runs AFTER the hnefatafl strength run releases the
# TPU. Sequential (the tunnel admits one process); each stage streams its
# artifacts into results/r4/ before the next starts. set -e so a failed
# stage never silently skips (ADVICE r3 items 1-2).
set -euo pipefail
cd /root/repo

run() {  # run <name> <cmd...>: timestamped, unbuffered, durable log
  local name="$1"; shift
  echo "=== START $name $(date -u +%H:%M:%S) ==="
  PYTHONUNBUFFERED=1 "$@" 2>&1 | tee -a "results/r4/${name}.log"
  echo "=== DONE $name $(date -u +%H:%M:%S) ==="
}

# Stage 1: chess 12 gated iterations, 64-game arenas (VERDICT item 3).
run chess_r4 python results/r4/chess_r4_config.py
test -f results/r4/chess_r4/metrics.jsonl

# Stage 2: brandubh ablation arms, cheapest-information-first
# (VERDICT items 2 and 6). Later arms can be cut by the round clock;
# each arm is independently complete.
for arm in b_lowsims_epoch a_lowsims_capped b_bf16 d_hisims_epoch c_hisims_capped; do
  run "brandubh_abl_${arm}" python results/r4/brandubh_ablation.py "$arm"
  test -f "results/r4/brandubh_abl_${arm}/metrics.jsonl"
done

echo "CHAIN DONE $(date -u +%H:%M:%S)"
