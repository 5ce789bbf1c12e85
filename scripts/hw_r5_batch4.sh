#!/bin/bash
# Round-5 hardware batch 4 (runs after batch3): post-fix re-measures.
#   1. scripts/profile_msoe_r5.py — vm splits after the matmul-resize +
#      deferred target broadcast landed
#   2. bench.py dress rehearsal -> docs/hw_r5/bench_dress.json
set -u
cd /root/repo
mkdir -p docs/hw_r5
LOG=docs/hw_r5/batch4.log
echo "=== hw_r5 batch4 start $(date -u +%FT%TZ) ===" | tee -a "$LOG"
for i in $(seq 1 480); do
  if grep -q "batch3 really done" docs/hw_r5/batch3.log 2>/dev/null; then break; fi
  sleep 30
done
if ! grep -q "batch3 really done" docs/hw_r5/batch3.log 2>/dev/null; then
  echo "batch3 never finished; aborting" | tee -a "$LOG"; exit 1
fi

echo "=== step 1: msoe split post-fix $(date -u +%T) ===" | tee -a "$LOG"
timeout 5400 python scripts/profile_msoe_r5.py \
  > docs/hw_r5/msoe_split2.log 2>&1
echo "step 1 rc=$?" | tee -a "$LOG"
tail -n 2 docs/hw_r5/msoe_split2.log | tee -a "$LOG"

echo "=== step 2: bench dress rehearsal $(date -u +%T) ===" | tee -a "$LOG"
timeout 10800 python bench.py > docs/hw_r5/bench_dress.json 2> docs/hw_r5/bench_dress.err
echo "step 2 rc=$?" | tee -a "$LOG"
tail -c 600 docs/hw_r5/bench_dress.json | tee -a "$LOG"

echo "=== hw_r5 batch4 done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
