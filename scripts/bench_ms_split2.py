"""Triangulate the ms fwd anomaly: direct fwd_call seg=1 vs seg=64 vs the
NHWC wrapper primal, plus wrapper grad — one process, no contention."""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from vsnca_tpu.config import NCAConfig
from vsnca_tpu.models.dynca import dynca_init, make_conditioning
from vsnca_tpu.ops import pallas_train as pt


def fetch(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def timeit(f, *args, reps=10):
    out = f(*args)
    fetch(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    fetch(jax.tree_util.tree_leaves(out)[0])
    return (time.time() - t0) / reps * 1e3


def main():
    print("warmup...", flush=True)
    fetch(jax.jit(lambda v: v + 1)(jnp.ones(8)))

    h = w = 256
    steps = 64
    b = 2
    cfg = NCAConfig(c_in=16, fc_dim=128, padding_mode="circular",
                    perception_scales=(0, 1), conditioning="pos_emb")
    seg, mode, tr = pt.plan_flat_train(cfg, h, w, steps, need_dcond=False)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    cp = pt._round8(16)
    ccp = pt._round8(cfg.c_cond)
    xf = jax.random.uniform(jax.random.PRNGKey(1), (b, cp, h * w)) - 0.5
    x_nhwc = jax.random.uniform(jax.random.PRNGKey(1), (b, h, w, 16)) - 0.5
    cond = make_conditioning(cfg, (h, w), batch=b)
    condf = jnp.pad(
        jnp.transpose(cond, (0, 3, 1, 2)),
        ((0, 0), (0, ccp - cfg.c_cond), (0, 0), (0, 0)),
    ).reshape(b, ccp, h * w)
    seed = jnp.int32(7)

    for name, sg in (("fwd_call seg=1", 1), ("fwd_call seg=64", 64)):
        fn = jax.jit(lambda p, x, sg=sg: pt._fwd_call_flat(
            p, x, condf, seed, cfg, steps, sg, "float32", False, h, w, tr))
        print(f"{name}: {timeit(fn, params, xf):.2f} ms", flush=True)

    wrap = jax.jit(lambda p, x: pt.fused_rollout_train_flat(
        p, x, 5.0, cfg, steps, cond_nhwc=cond, cond_no_grad=True)[0])
    print(f"wrapper primal (seg={steps}): {timeit(wrap, params, x_nhwc):.2f} ms",
          flush=True)

    def loss(p, x):
        s, _ = pt.fused_rollout_train_flat(p, x, 5.0, cfg, steps,
                                           cond_nhwc=cond, cond_no_grad=True)
        return jnp.sum(s ** 2)

    g = jax.jit(jax.grad(loss))
    print(f"wrapper grad (seg={seg}): {timeit(g, params, x_nhwc):.2f} ms",
          flush=True)

    # XLA reference in the same process
    from vsnca_tpu.models.dynca import dynca_rollout

    def lx(p, x):
        s, _ = dynca_rollout(p, x, jax.random.PRNGKey(2), cfg, steps,
                             cond=cond, remat="per_step")
        return jnp.sum(s ** 2)

    gx = jax.jit(jax.grad(lx))
    print(f"xla grad: {timeit(gx, params, x_nhwc):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
