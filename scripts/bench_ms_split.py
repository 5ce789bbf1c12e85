"""Isolate fwd-call vs bwd-call cost of the ms pair at 256^2 (internal
APIs, probe only)."""
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
    for name, scales, c, f in (("ms", (0, 1), 16, 128),
                               ("s0", (0,), 16, 128)):
        cfg = NCAConfig(c_in=c, fc_dim=f, padding_mode="circular",
                        perception_scales=scales, conditioning="pos_emb")
        plan = pt.plan_flat_train(cfg, h, w, steps, need_dcond=False)
        print(name, "plan:", plan, flush=True)
        if plan is None:
            continue
        seg, mode, tr = plan
        params = dynca_init(jax.random.PRNGKey(0), cfg)
        cp = pt._round8(c)
        ccp = pt._round8(cfg.c_cond)
        xf = jax.random.uniform(jax.random.PRNGKey(1), (b, cp, h * w)) - 0.5
        cond = make_conditioning(cfg, (h, w), batch=b)
        condf = jnp.pad(
            jnp.transpose(cond, (0, 3, 1, 2)),
            ((0, 0), (0, ccp - cfg.c_cond), (0, 0), (0, 0)),
        ).reshape(b, ccp, h * w)
        seed = jnp.int32(7)
        gy = jax.random.normal(jax.random.PRNGKey(3), (b, cp, h * w))

        fwd = jax.jit(lambda p, x: pt._fwd_call_flat(
            p, x, condf, seed, cfg, steps, seg, "float32", False, h, w, tr))
        y, ckpt = fwd(params, xf)
        ms_fwd = timeit(fwd, params, xf)
        print(f"{name} fwd_call (seg={seg}): {ms_fwd:.2f} ms", flush=True)

        bwd = jax.jit(lambda p, ck, g: pt._bwd_call_flat(
            p, ck, condf, seed, g, cfg, steps, seg, "float32", False, h, w,
            mode, tr, False))
        ms_bwd = timeit(bwd, params, ckpt, gy)
        print(f"{name} bwd_call ({mode}): {ms_bwd:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
