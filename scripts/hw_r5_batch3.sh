#!/bin/bash
# Round-5 hardware batch 3 (runs after batch2).
#   1. scripts/profile_encvgg_r5.py — isolate the encoder loss-path 107 ms
set -u
cd /root/repo
mkdir -p docs/hw_r5
LOG=docs/hw_r5/batch3.log
echo "=== hw_r5 batch3 start $(date -u +%FT%TZ) ===" | tee -a "$LOG"
for i in $(seq 1 480); do
  if grep -q "batch2 done" docs/hw_r5/batch2.log 2>/dev/null; then break; fi
  sleep 30
done
if ! grep -q "batch2 done" docs/hw_r5/batch2.log 2>/dev/null; then
  echo "batch2 never finished; aborting" | tee -a "$LOG"; exit 1
fi

echo "=== step 1: encoder vgg micro $(date -u +%T) ===" | tee -a "$LOG"
timeout 5400 python scripts/profile_encvgg_r5.py \
  > docs/hw_r5/encvgg_micro.log 2>&1
echo "step 1 rc=$?" | tee -a "$LOG"
tail -n 2 docs/hw_r5/encvgg_micro.log | tee -a "$LOG"
echo "=== hw_r5 batch3 done $(date -u +%FT%TZ) ===" | tee -a "$LOG"

echo "=== step 2: encoder marginals rerun (device pool + remat A/B) $(date -u +%T) ===" | tee -a "$LOG"
timeout 5400 python scripts/profile_encoder_r5.py \
  > docs/hw_r5/encoder_marginals2.log 2>&1
echo "step 2 rc=$?" | tee -a "$LOG"
tail -n 2 docs/hw_r5/encoder_marginals2.log | tee -a "$LOG"
echo "=== hw_r5 batch3 really done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
