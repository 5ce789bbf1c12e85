"""Microbench round 2: wide rolls, strided gather/interleave (compact
half-grid ops), iota masks — plus the ms fwd/bwd split at 256^2."""
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

ITERS = 1000


def fetch(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def run(shape, body, name, extra_in=None):
    def kernel(x_ref, o_ref):
        def step(i, acc):
            return body(acc, i)
        o_ref[:] = jax.lax.fori_loop(0, ITERS, step, x_ref[:])

    f = jax.jit(lambda x: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
    )(x))
    x = jnp.ones(shape, jnp.float32)
    fetch(f(x))
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

    CP, NB = 16, 3584
    run((CP, NB), lambda a, i: a * 1.000001, "mul [16,3584]")
    run((CP, NB), lambda a, i: pltpu.roll(a, 1, axis=1) * 1.000001,
        "roll1 [16,3584]")
    run((64, NB), lambda a, i: pltpu.roll(a, 1, axis=1) * 1.000001,
        "roll1 [64,3584]")
    run((128, NB), lambda a, i: pltpu.roll(a, 1, axis=1) * 1.000001,
        "roll1 [128,3584]")
    run((128, NB // 4), lambda a, i: pltpu.roll(a, 1, axis=1) * 1.000001,
        "roll1 [128,896]")

    # strided gather (compact half-grid downsample) and interleave (up)
    def gather_even(a, i):
        half = a[:, ::2] * 1.000001          # [CP, NB/2]
        return jnp.concatenate([half, half], axis=1)

    run((CP, NB), gather_even, "gather-even + concat [16,3584]")

    def interleave(a, i):
        h1 = a[:, : NB // 2] * 1.000001
        h2 = a[:, NB // 2 :]
        out = jnp.stack([h1, h2], axis=-1).reshape(a.shape[0], NB)
        return out

    run((CP, NB), interleave, "interleave2 [16,3584]")
    run((128, NB), interleave, "interleave2 [128,3584]")

    def masks(a, i):
        col = jax.lax.broadcasted_iota(jnp.int32, (1, NB), 1) % 256
        grow = (i + jax.lax.broadcasted_iota(jnp.int32, (1, NB), 1) // 256) % 64
        m = (col < 2) & (grow % 2 == 0)
        return a + m.astype(jnp.float32)

    run((CP, NB), masks, "iota mask build")

    def where_op(a, i):
        col = jax.lax.broadcasted_iota(jnp.int32, (1, NB), 1) % 256
        return jnp.where(col == 0, a * 2.0, a) * 1.000001

    run((CP, NB), where_op, "where(col mask)")

    # view-add: shifted slice add (row-offset view pattern)
    def view_add(a, i):
        out = a[:, : NB - 256] + a[:, 256:]
        return jnp.concatenate([out, a[:, NB - 256 :]], axis=1) * 1.000001

    run((CP, NB), view_add, "view-add(+256) + concat")


if __name__ == "__main__":
    main()
