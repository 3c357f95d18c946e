#!/bin/bash
# Poll the tunneled TPU backend until it answers; exit 0 on recovery.
# The backend's failure mode is a HANG during init, so every probe is a
# killable child with a timeout. Interval is gentle (the host is one CPU
# core shared with renders/compiles/tests).
INTERVAL="${1:-180}"
PROBE_TIMEOUT="${2:-90}"
while true; do
  if timeout "$PROBE_TIMEOUT" python -c "import jax; d=jax.devices(); assert d[0].platform=='tpu', d; print(d[0].device_kind)" 2>/dev/null; then
    echo "CHIP UP at $(date -u +%FT%TZ)"
    exit 0
  fi
  echo "chip down at $(date -u +%FT%TZ); retry in ${INTERVAL}s"
  sleep "$INTERVAL"
done
