#!/bin/bash
# Round-5 hardware batch 8 (final): standing hw suite (9 tests incl. the
# new cnca-pair checks), an encoder-preset convergence run through the
# fused pair, and the final bench dress rehearsal.
set -u
cd /root/repo
LOG=docs/hw_r5/batch8.log
echo "=== hw_r5 batch8 start $(date -u +%FT%TZ) ===" | tee -a "$LOG"
for i in $(seq 1 480); do
  if grep -q "batch7 done" docs/hw_r5/batch7.log 2>/dev/null; then break; fi
  sleep 20
done

echo "=== step 1: tpu hardware tests (9) $(date -u +%T) ===" | tee -a "$LOG"
VSNCA_TPU_TESTS=1 timeout 5400 python -m pytest tests/test_tpu_hardware.py -v \
  > docs/hw_r5/tpu_tests2.log 2>&1
echo "step 1 rc=$?" | tee -a "$LOG"
tail -n 3 docs/hw_r5/tpu_tests2.log | tee -a "$LOG"

echo "=== step 2: encoder artifact run (fused pair) $(date -u +%T) ===" | tee -a "$LOG"
timeout 7200 python scripts/make_artifacts.py --presets encoder \
  --out-root assets/runs_r5 \
  > docs/hw_r5/encoder_run_fused.log 2>&1
echo "step 2 rc=$?" | tee -a "$LOG"
tail -n 3 docs/hw_r5/encoder_run_fused.log | tee -a "$LOG"

echo "=== step 3: final bench dress $(date -u +%T) ===" | tee -a "$LOG"
timeout 10800 python bench.py > docs/hw_r5/bench_dress2.json 2> docs/hw_r5/bench_dress2.err
echo "step 3 rc=$?" | tee -a "$LOG"
tail -c 400 docs/hw_r5/bench_dress2.json | tee -a "$LOG"
echo "=== hw_r5 batch8 done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
