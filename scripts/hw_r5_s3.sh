#!/bin/bash
# Round-5 session-3 hardware batch: re-run the recycle-cut measurements.
#   A: vm remat A/B + bench encoder row (one process)  -> hw_r5/s3a.log
#   B: full bench dress (what the driver runs)         -> hw_r5/bench_dress3.json
set -u
cd /root/repo
LOG=docs/hw_r5/s3_batch.log
echo "=== hw_r5 s3 start $(date -u +%FT%TZ) ===" | tee -a "$LOG"

echo "=== step A: remat probe + encoder bench row $(date -u +%T) ===" | tee -a "$LOG"
timeout 3600 python scripts/hw_r5_s3a.py > docs/hw_r5/s3a.log 2>&1
echo "step A rc=$?" | tee -a "$LOG"
grep -E "REMAT_AB|ENCODER_ROW|failed" docs/hw_r5/s3a.log | tee -a "$LOG"

echo "=== step B: full bench dress $(date -u +%T) ===" | tee -a "$LOG"
timeout 5400 python bench.py > docs/hw_r5/bench_dress3.json 2> docs/hw_r5/bench_dress3.err
echo "step B rc=$?" | tee -a "$LOG"
tail -c 400 docs/hw_r5/bench_dress3.json | tee -a "$LOG"

echo "=== hw_r5 s3 done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
