#!/bin/bash
# Round-5 hardware batch 7: gate-free strict cnca parity (validator v3).
set -u
cd /root/repo
LOG=docs/hw_r5/batch7.log
echo "=== hw_r5 batch7 start $(date -u +%FT%TZ) ===" | tee -a "$LOG"
for i in $(seq 1 480); do
  if grep -q "batch6 done" docs/hw_r5/batch6.log 2>/dev/null; then break; fi
  sleep 20
done
echo "=== step 1: cnca pair validation v3 $(date -u +%T) ===" | tee -a "$LOG"
timeout 5400 python scripts/validate_cnca_pair_hw.py \
  > docs/hw_r5/cnca_pair_hw3.log 2>&1
echo "step 1 rc=$?" | tee -a "$LOG"
tail -n 3 docs/hw_r5/cnca_pair_hw3.log | tee -a "$LOG"
echo "=== hw_r5 batch7 done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
