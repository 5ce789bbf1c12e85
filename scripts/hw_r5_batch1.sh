#!/bin/bash
# Round-5 hardware batch 1 (one process at a time; axon tunnel).
# Results land in docs/hw_r5/ so they survive VM resets.
# Steps:
#   0. compiler probe (first jit in a fresh process pays 3-7 min warmup)
#   1. VSNCA_TPU_TESTS=1 pytest tests/test_tpu_hardware.py  (VERDICT r4 #5)
#   2. scripts/profile_vm_r4.py   — post-eq-VJP marginals   (VERDICT r4 #1)
#   3. scripts/profile_encoder_r5.py — encoder split        (VERDICT r4 #2)
set -u
cd /root/repo
mkdir -p docs/hw_r5
LOG=docs/hw_r5/batch1.log
echo "=== hw_r5 batch1 start $(date -u +%FT%TZ) ===" | tee -a "$LOG"

probe() {
  timeout 900 python - <<'EOF'
import time, sys
t0 = time.perf_counter()
import jax, jax.numpy as jnp, numpy as np
np.asarray(jax.device_get(jax.jit(lambda x: x + 1)(jnp.ones(8))))
print(f"probe ok: backend={jax.default_backend()} warmup={time.perf_counter()-t0:.1f}s", flush=True)
EOF
}

ok=0
for i in 1 2 3 4 5 6; do
  echo "--- probe attempt $i $(date -u +%T) ---" | tee -a "$LOG"
  if probe >> "$LOG" 2>&1; then ok=1; break; fi
  echo "probe attempt $i failed/timed out" | tee -a "$LOG"
  sleep 30
done
if [ "$ok" != 1 ]; then
  echo "COMPILER UNREACHABLE after 6 probes; aborting batch" | tee -a "$LOG"
  exit 1
fi

echo "=== step 1: tpu hardware tests $(date -u +%T) ===" | tee -a "$LOG"
VSNCA_TPU_TESTS=1 timeout 5400 python -m pytest tests/test_tpu_hardware.py -v \
  > docs/hw_r5/tpu_tests.log 2>&1
echo "step 1 rc=$?" | tee -a "$LOG"
tail -n 3 docs/hw_r5/tpu_tests.log | tee -a "$LOG"

echo "=== step 2: vm marginals $(date -u +%T) ===" | tee -a "$LOG"
timeout 5400 python scripts/profile_vm_r4.py \
  > docs/hw_r5/vm_marginals.log 2>&1
echo "step 2 rc=$?" | tee -a "$LOG"
tail -n 2 docs/hw_r5/vm_marginals.log | tee -a "$LOG"

echo "=== step 3: encoder marginals $(date -u +%T) ===" | tee -a "$LOG"
timeout 5400 python scripts/profile_encoder_r5.py \
  > docs/hw_r5/encoder_marginals.log 2>&1
echo "step 3 rc=$?" | tee -a "$LOG"
tail -n 2 docs/hw_r5/encoder_marginals.log | tee -a "$LOG"

echo "=== hw_r5 batch1 done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
