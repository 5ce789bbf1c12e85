#!/bin/bash
# Round-5 hardware batch 2 (runs after batch1; one process at a time).
#   1. scripts/profile_msoe_r5.py      — MSOE split inside the vm iteration
#   2. scripts/bench_cnca_roofline.py  — cnca us/step for docs/ROOFLINE.md §3
#   3. full-budget video-motion run    — 5000 iters @256², reference budget
#      (VERDICT r4 #4), loss JSONL + final_loss_test.txt + gif
set -u
cd /root/repo
mkdir -p docs/hw_r5
LOG=docs/hw_r5/batch2.log
echo "=== hw_r5 batch2 start $(date -u +%FT%TZ) ===" | tee -a "$LOG"

# wait for batch1 to finish (its last line marks completion)
for i in $(seq 1 240); do
  if grep -q "batch1 done" docs/hw_r5/batch1.log 2>/dev/null; then break; fi
  sleep 30
done
if ! grep -q "batch1 done" docs/hw_r5/batch1.log 2>/dev/null; then
  echo "batch1 never finished; aborting" | tee -a "$LOG"; exit 1
fi

echo "=== step 1: msoe split $(date -u +%T) ===" | tee -a "$LOG"
timeout 5400 python scripts/profile_msoe_r5.py \
  > docs/hw_r5/msoe_split.log 2>&1
echo "step 1 rc=$?" | tee -a "$LOG"
tail -n 2 docs/hw_r5/msoe_split.log | tee -a "$LOG"

echo "=== step 2: cnca roofline $(date -u +%T) ===" | tee -a "$LOG"
timeout 5400 python scripts/bench_cnca_roofline.py \
  > docs/hw_r5/cnca_timing.log 2>&1
echo "step 2 rc=$?" | tee -a "$LOG"
tail -n 2 docs/hw_r5/cnca_timing.log | tee -a "$LOG"

echo "=== step 3: full-budget video-motion (5000 it @256) $(date -u +%T) ===" | tee -a "$LOG"
timeout 14400 python scripts/make_artifacts.py --presets video_motion \
  --scale 2.5 --out-root assets/runs_full \
  > docs/hw_r5/vm_full_budget.log 2>&1
echo "step 3 rc=$?" | tee -a "$LOG"
tail -n 3 docs/hw_r5/vm_full_budget.log | tee -a "$LOG"

echo "=== hw_r5 batch2 done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
