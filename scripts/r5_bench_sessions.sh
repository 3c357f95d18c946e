#!/bin/bash
# Opportunistic end-of-round bench sampler: while the round is open, capture
# a dated headline bench (bench.py, full SSIM gates) every INTERVAL seconds,
# append the JSON record to results/r5/bench_sessions.jsonl, and commit each
# capture. Purpose: the round's closing numbers are measured on FINAL round-5
# code across several chip windows, not a single roll of the shared-chip
# contention dice (docs/PERFORMANCE.md drift band). Stop by touching
# results/r5/BENCH_SESSIONS_STOP.
cd /root/repo
mkdir -p results/r5
OUT=results/r5/bench_sessions.jsonl
LOG=results/r5/bench_sessions.log
INTERVAL=${INTERVAL:-600}
MAX=${MAX:-24}
i=0
while [ "$i" -lt "$MAX" ] && [ ! -f results/r5/BENCH_SESSIONS_STOP ]; do
  i=$((i + 1))
  echo "bench session $i at $(date -u +%FT%TZ)" >> "$LOG"
  line=$(RAYZEN_PROBE_ATTEMPTS=1 timeout 1200 python bench.py 2>> "$LOG")
  rc=$?
  if [ "$rc" -eq 0 ] && [ -n "$line" ] && ! echo "$line" | grep -q replayed_from; then
    echo "$line" >> "$OUT"
    git add "$OUT" "$LOG" >> "$LOG" 2>&1
    val=$(echo "$line" | python -c 'import json,sys; print(json.load(sys.stdin)["value"])' 2>/dev/null)
    git commit -q -m "r5 bench session $i: ${val} Mrays/s sustained (dated capture on final-round code)" >> "$LOG" 2>&1
  else
    echo "bench session $i failed rc=$rc" >> "$LOG"
  fi
  [ -f results/r5/BENCH_SESSIONS_STOP ] && break
  sleep "$INTERVAL"
done
echo "bench sessions done at $(date -u +%FT%TZ)" >> "$LOG"
