"""Decisive width microbench for the batched-kernel question: is VPU work
on [16, L] arrays latency-bound (wide [128, L] ops amortize -> batching
wins) or volume-bound (no win)? Same TOTAL element volume per variant."""
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

L = 4096


def fetch(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def run(cp, iters, name):
    def kernel(x_ref, o_ref):
        def step(i, x):
            y = pltpu.roll(x, 1, axis=1)
            return x * 0.999 + y * 0.001

        o_ref[:] = jax.lax.fori_loop(0, iters, step, x_ref[:])

    f = jax.jit(lambda x: pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((cp, L), jnp.float32))(x))
    x = jnp.ones((cp, L), jnp.float32)
    fetch(f(x))
    reps = 6
    t0 = time.time()
    r = x
    for _ in range(reps):
        r = f(r)
    fetch(r)
    dt = (time.time() - t0) / reps
    vol = cp * L * iters
    print(f"{name}: {dt*1e3:.2f} ms/call, {vol/dt/1e9:.1f} Gelem/s",
          flush=True)


def main():
    print("warmup...", flush=True)
    fetch(jax.jit(lambda v: v + 1)(jnp.ones(8)))
    # equal total volume: 16x8000 vs 64x2000 vs 128x1000 iterations
    run(16, 8000, "narrow [16,4096] x8000")
    run(64, 2000, "mid    [64,4096] x2000")
    run(128, 1000, "wide  [128,4096] x1000")
    run(16, 8000, "narrow again (stability)")


if __name__ == "__main__":
    main()
