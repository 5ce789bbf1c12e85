#!/bin/bash
# Round-5 hardware batch 9: full standing hardware suite post resize-pin.
set -u
cd /root/repo
LOG=docs/hw_r5/batch9.log
echo "=== hw_r5 batch9 start $(date -u +%FT%TZ) ===" | tee -a "$LOG"
for i in $(seq 1 480); do
  if grep -q "batch8 done" docs/hw_r5/batch8.log 2>/dev/null; then break; fi
  sleep 20
done
echo "=== step 1: tpu hardware tests post-fix $(date -u +%T) ===" | tee -a "$LOG"
VSNCA_TPU_TESTS=1 timeout 5400 python -m pytest tests/test_tpu_hardware.py -v \
  > docs/hw_r5/tpu_tests3.log 2>&1
echo "step 1 rc=$?" | tee -a "$LOG"
tail -n 2 docs/hw_r5/tpu_tests3.log | tee -a "$LOG"
echo "=== hw_r5 batch9 done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
