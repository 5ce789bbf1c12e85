#!/bin/bash
# Round-5 session-2 hardware batch: the three runs queued at the end of
# session 1 that never executed (machine recycled at ~20:52Z):
#   1. standing hardware suite post resize-pin (batch 9)
#   2. vm-term remat A/B probe (batch 10)
#   3. fresh full bench dress (batch 8 step 3 was cut mid-run)
# One hardware process at a time (CLAUDE.md).
set -u
cd /root/repo
LOG=docs/hw_r5/s2_batch.log
echo "=== hw_r5 s2 start $(date -u +%FT%TZ) ===" | tee -a "$LOG"

echo "=== step 0: warmup probe $(date -u +%T) ===" | tee -a "$LOG"
timeout 900 python -c "
import time, jax, jax.numpy as jnp, numpy as np
t0=time.perf_counter()
np.asarray(jax.device_get(jax.jit(lambda x: x+1)(jnp.ones(8))))
print(f'warmup {time.perf_counter()-t0:.1f}s backend={jax.default_backend()}')
" 2>&1 | tail -n 2 | tee -a "$LOG"

echo "=== step 1: tpu hardware tests post-fix $(date -u +%T) ===" | tee -a "$LOG"
VSNCA_TPU_TESTS=1 timeout 5400 python -m pytest tests/test_tpu_hardware.py -v \
  > docs/hw_r5/tpu_tests3.log 2>&1
echo "step 1 rc=$?" | tee -a "$LOG"
tail -n 2 docs/hw_r5/tpu_tests3.log | tee -a "$LOG"

echo "=== step 2: vm remat probe $(date -u +%T) ===" | tee -a "$LOG"
timeout 5400 python scripts/probe_vm_remat_r5.py \
  > docs/hw_r5/vm_remat_ab.log 2>&1
echo "step 2 rc=$?" | tee -a "$LOG"
tail -n 2 docs/hw_r5/vm_remat_ab.log | tee -a "$LOG"

echo "=== step 3: full bench dress $(date -u +%T) ===" | tee -a "$LOG"
timeout 5400 python bench.py > docs/hw_r5/bench_dress3.json \
  2> docs/hw_r5/bench_dress3.err
echo "step 3 rc=$?" | tee -a "$LOG"
tail -n 1 docs/hw_r5/bench_dress3.json | tee -a "$LOG"

echo "=== hw_r5 s2 done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
