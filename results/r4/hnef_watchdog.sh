#!/bin/bash
# Watchdog driver for the hnefatafl_r4 strength run: the axon tunnel
# intermittently wedges an RPC mid-phase (observed: a checkpoint-save
# device->host pull frozen >20 min with zero CPU). Coach resume is
# checkpoint-exact, so the cheapest recovery is kill + relaunch when the
# log stops moving. set -e hygiene per ADVICE r3.
set -u
cd /root/repo
LOG=results/r4/hnefatafl_r4.log
STALL_S=480

while true; do
  if grep -q "TRAINING DONE" "$LOG" 2>/dev/null; then
    echo "[watchdog] training done; exiting" >> "$LOG"
    break
  fi
  PYTHONUNBUFFERED=1 python results/r4/hnefatafl_r4_config.py >> "$LOG" 2>&1 &
  PID=$!
  echo "PID=$PID" > results/r4/hnefatafl_r4.pid
  echo "[watchdog] launched $PID $(date -u +%H:%M:%S)" >> "$LOG"
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    size1=$(stat -c %s "$LOG")
    sleep 60
    if ! kill -0 "$PID" 2>/dev/null; then break; fi
    size2=$(stat -c %s "$LOG")
    if [ "$size1" = "$size2" ]; then
      # no log movement in 60s; require STALL_S of silence before killing
      age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
      if [ "$age" -ge "$STALL_S" ]; then
        echo "[watchdog] stall ${age}s; killing $PID $(date -u +%H:%M:%S)" >> "$LOG"
        kill -9 "$PID" 2>/dev/null
        wait "$PID" 2>/dev/null
        sleep 90  # tunnel grant cooldown
        break
      fi
    fi
  done
done
