#!/bin/bash
# Round-5 hardware batch 6: re-validate the cnca pair with the short-horizon
# strict check + the XLA precision control (batch5 showed 64-step pointwise
# divergence — determine kernel-bug vs chaotic amplification).
set -u
cd /root/repo
mkdir -p docs/hw_r5
LOG=docs/hw_r5/batch6.log
echo "=== hw_r5 batch6 start $(date -u +%FT%TZ) ===" | tee -a "$LOG"
for i in $(seq 1 480); do
  if grep -q "batch5 done" docs/hw_r5/batch5.log 2>/dev/null; then break; fi
  sleep 20
done
echo "=== step 1: cnca pair validation v2 $(date -u +%T) ===" | tee -a "$LOG"
timeout 5400 python scripts/validate_cnca_pair_hw.py \
  > docs/hw_r5/cnca_pair_hw2.log 2>&1
echo "step 1 rc=$?" | tee -a "$LOG"
tail -n 3 docs/hw_r5/cnca_pair_hw2.log | tee -a "$LOG"
echo "=== hw_r5 batch6 done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
