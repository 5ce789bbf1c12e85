#!/bin/bash
# Round-5 hardware batch 10: vm-term remat A/B.
set -u
cd /root/repo
LOG=docs/hw_r5/batch10.log
echo "=== hw_r5 batch10 start $(date -u +%FT%TZ) ===" | tee -a "$LOG"
for i in $(seq 1 480); do
  if grep -q "batch9 done" docs/hw_r5/batch9.log 2>/dev/null; then break; fi
  sleep 20
done
echo "=== step 1: vm remat probe $(date -u +%T) ===" | tee -a "$LOG"
timeout 5400 python scripts/probe_vm_remat_r5.py \
  > docs/hw_r5/vm_remat_ab.log 2>&1
echo "step 1 rc=$?" | tee -a "$LOG"
tail -n 2 docs/hw_r5/vm_remat_ab.log | tee -a "$LOG"
echo "=== hw_r5 batch10 done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
