#!/bin/bash
# Persistent round-5 campaign trigger (VERDICT r4 next #1): wait for the
# tunneled chip to answer, then run the pre-registered campaign; if the
# campaign bails (tunnel dropped mid-stage), go back to waiting. Stage-level
# done markers inside r5_campaign.sh make re-entry cheap. Writes a heartbeat
# so the builder can check progress without attaching.
cd /root/repo
mkdir -p results/r5
LOG=results/r5/watch.log
while [ ! -f results/r5/CAMPAIGN_DONE ]; do
  echo "watch: waiting for chip at $(date -u +%FT%TZ)" | tee -a "$LOG"
  bash scripts/wait_chip.sh 120 90 >> "$LOG" 2>&1 || { sleep 60; continue; }
  echo "watch: chip up, launching campaign at $(date -u +%FT%TZ)" | tee -a "$LOG"
  if bash scripts/r5_campaign.sh >> "$LOG" 2>&1; then
    touch results/r5/CAMPAIGN_DONE
    echo "watch: campaign complete at $(date -u +%FT%TZ)" | tee -a "$LOG"
  else
    echo "watch: campaign yielded (chip lost?) at $(date -u +%FT%TZ)" | tee -a "$LOG"
    sleep 60
  fi
done
