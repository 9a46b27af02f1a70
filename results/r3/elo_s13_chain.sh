#!/bin/bash
# Round-3 second-seed Elo A/B chain (VERDICT r2 item 7):
# wait for the base arm (PID passed as $1, launched separately), run the
# reuse arm, then the pooled seed-13 tournament with the RawMCTS anchor
# (reusing the round-2 tournament driver unchanged), archive per-iteration
# metrics into results/r3 (the round-3 chess/hnefatafl logs were lost to a
# container reset because they lived in gitignored runs/ — everything this
# chain produces lands in results/ where it gets committed), then re-drive
# the chess end-to-end run so its evidence is durable too.
set -u
cd /root/repo
BASE_PID=${1:?usage: elo_s13_chain.sh <base_arm_pid>}

while kill -0 "$BASE_PID" 2>/dev/null; do sleep 10; done
if ! grep -q "TRAINING DONE" results/r3/c4_elo_base_s13.log; then
  echo "CHAIN ABORT: base arm exited without TRAINING DONE" >&2
  exit 1
fi
cp runs/c4_elo_base_s13/metrics.jsonl results/r3/c4_elo_base_s13_metrics.jsonl

python results/r3/c4_elo_reuse_s13_config.py > results/r3/c4_elo_reuse_s13.log 2>&1
if ! grep -q "TRAINING DONE" results/r3/c4_elo_reuse_s13.log; then
  echo "CHAIN ABORT: reuse arm exited without TRAINING DONE" >&2
  exit 1
fi
cp runs/c4_elo_reuse_s13/metrics.jsonl results/r3/c4_elo_reuse_s13_metrics.jsonl

python results/r2/elo_tournament.py \
  --runs c4_elo_base_s13 c4_elo_reuse_s13 \
  --iters 1,5,10,15 --games 64 --sims 100 \
  --out results/r3/elo_s13.json > results/r3/elo_s13_tournament.log 2>&1
echo "TOURNAMENT DONE"

# Regenerate durable chess end-to-end evidence (partial iterations are
# still archived per-iteration via metrics.jsonl + the streaming log).
# timeout-capped so a long chess iteration can never hold the single-process
# TPU tunnel against the driver's end-of-round bench.
timeout 1200 python results/r3/chess_r3_config.py > results/r3/chess_r3.log 2>&1
cp runs/chess_r3/metrics.jsonl results/r3/chess_r3_metrics.jsonl 2>/dev/null
echo "CHAIN DONE"
