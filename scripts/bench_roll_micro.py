"""Microbench: per-op cost of pltpu.roll / where / iota masks inside a
fori kernel on tile-sized [16, 3584] f32 arrays (the ms percept's working
shape). Tells us whether the 395 ms ms-grad is roll-bound."""
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

CP, NB = 16, 3584
ITERS = 2000


def fetch(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def run(body, name):
    def kernel(x_ref, o_ref):
        def step(i, acc):
            return body(acc, i)
        o_ref[:] = jax.lax.fori_loop(0, ITERS, step, x_ref[:])

    f = jax.jit(lambda x: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((CP, NB), jnp.float32),
    )(x))
    x = jnp.ones((CP, NB), jnp.float32)
    fetch(f(x))  # compile
    t0 = time.time()
    r = f(x)
    for _ in range(4):
        r = f(r * 0 + 1)
    fetch(r)
    dt = (time.time() - t0) / 5 / ITERS * 1e9
    print(f"{name}: {dt:.0f} ns/iter", flush=True)


def main():
    print("warmup...", flush=True)
    fetch(jax.jit(lambda v: v + 1)(jnp.ones(8)))

    run(lambda a, i: a + 1.0, "add")
    run(lambda a, i: pltpu.roll(a, 1, axis=1) + 1.0, "roll(1)")
    run(lambda a, i: pltpu.roll(a, 2, axis=1) + 1.0, "roll(2)")
    run(lambda a, i: pltpu.roll(a, 254, axis=1) + 1.0, "roll(254)")
    run(lambda a, i: pltpu.roll(a, 256, axis=1) + 1.0, "roll(256=2w aligned)")
    run(lambda a, i: pltpu.roll(a, 1024, axis=1) + 1.0, "roll(1024 aligned)")

    col = jax.lax.broadcasted_iota(jnp.int32, (1, NB), 1) % 256
    m = col < 2

    def wh(a, i):
        return jnp.where(m, a, 0.0) + 1.0
    run(wh, "where(static mask)")

    def mask_make(a, i):
        grow = (i + jax.lax.broadcasted_iota(jnp.int32, (1, NB), 1) // 256) % 64
        return a + (grow == 0).astype(jnp.float32)
    run(mask_make, "iota+mod mask build")

    def view_add(a, i):
        return a + jnp.concatenate([a[:, 256:], a[:, :256]], axis=1)
    run(view_add, "concat-shift(256)")


if __name__ == "__main__":
    main()
