#!/bin/bash
# Generic watchdog driver for r5 strength runs (adapted from r4's
# hnef_watchdog.sh): the axon tunnel intermittently wedges an RPC mid-phase;
# Coach resume is checkpoint-exact, so recovery is kill-exact-PID + relaunch
# when the log stops moving. Usage: run_watchdog.sh <config.py> <log> [max_s]
set -u
cd /root/repo
CFG="$1"
LOG="$2"
MAX_S="${3:-999999}"   # wall-clock budget; exceeded => clean stop
STALL_S=480
T0=$(date +%s)

while true; do
  if grep -q "TRAINING DONE" "$LOG" 2>/dev/null; then
    echo "[watchdog] training done; exiting" >> "$LOG"
    break
  fi
  if [ $(( $(date +%s) - T0 )) -ge "$MAX_S" ]; then
    echo "[watchdog] wall-clock budget reached; exiting" >> "$LOG"
    break
  fi
  PYTHONUNBUFFERED=1 python "$CFG" >> "$LOG" 2>&1 &
  PID=$!
  echo "PID=$PID" > "${LOG%.log}.pid"
  echo "[watchdog] launched $PID $(date -u +%H:%M:%S)" >> "$LOG"
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    size1=$(stat -c %s "$LOG")
    sleep 60
    if ! kill -0 "$PID" 2>/dev/null; then break; fi
    if [ $(( $(date +%s) - T0 )) -ge "$MAX_S" ]; then
      echo "[watchdog] budget reached; stopping $PID" >> "$LOG"
      kill "$PID" 2>/dev/null; sleep 20; kill -9 "$PID" 2>/dev/null
      wait "$PID" 2>/dev/null
      break
    fi
    size2=$(stat -c %s "$LOG")
    if [ "$size1" = "$size2" ]; then
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
