#!/bin/bash
# Round-5 hardware batch 5 (runs after batch4): the fused cnca train pair.
#   1. scripts/validate_cnca_pair_hw.py — hardware grad parity + trainer A/B
set -u
cd /root/repo
mkdir -p docs/hw_r5
LOG=docs/hw_r5/batch5.log
echo "=== hw_r5 batch5 start $(date -u +%FT%TZ) ===" | tee -a "$LOG"
for i in $(seq 1 480); do
  if grep -q "batch4 done" docs/hw_r5/batch4.log 2>/dev/null; then break; fi
  sleep 30
done
if ! grep -q "batch4 done" docs/hw_r5/batch4.log 2>/dev/null; then
  echo "batch4 never finished; aborting" | tee -a "$LOG"; exit 1
fi

echo "=== step 1: cnca pair hardware validation $(date -u +%T) ===" | tee -a "$LOG"
timeout 5400 python scripts/validate_cnca_pair_hw.py \
  > docs/hw_r5/cnca_pair_hw.log 2>&1
echo "step 1 rc=$?" | tee -a "$LOG"
tail -n 3 docs/hw_r5/cnca_pair_hw.log | tee -a "$LOG"
echo "=== hw_r5 batch5 done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
