"""Component timing for the ms fused pair: fwd primal vs grad, vs XLA."""
import argparse
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from vsnca_tpu.config import NCAConfig
from vsnca_tpu.models.dynca import dynca_init, dynca_rollout, make_conditioning
from vsnca_tpu.ops import pallas_train as pt


def fetch(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def timeit(fn, params, x, reps, pick):
    acc = x
    fetch(pick(fn(params, acc)))  # compile+warm
    t0 = time.time()
    for _ in range(reps):
        out = fn(params, acc)
        acc = acc + 0.0 * pick(out)
    fetch(acc)
    return (time.time() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()
    h = w = args.size

    cfg = NCAConfig(c_in=16, fc_dim=128, padding_mode="circular",
                    perception_scales=(0, 1), conditioning="pos_emb")
    print("warmup...", flush=True)
    fetch(jax.jit(lambda v: v + 1)(jnp.ones(8)))

    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (args.batch, h, w, cfg.c_in),
                           minval=-0.5, maxval=0.5)
    cond = make_conditioning(cfg, (h, w), batch=args.batch)
    plan = pt.plan_flat_train(cfg, h, w, args.steps, need_dcond=False)
    print("plan:", plan, flush=True)

    def f_fwd(p, xx):
        s, rgb = pt.fused_rollout_train_flat(
            p, xx, 5.0, cfg, args.steps, cond_nhwc=cond, cond_no_grad=True)
        return s

    def x_fwd(p, xx):
        s, rgb = dynca_rollout(p, xx, jax.random.PRNGKey(2), cfg, args.steps,
                               cond=cond, remat="per_step")
        return s

    def mk_grad(fwd):
        def loss(p, xx):
            s = fwd(p, xx)
            return jnp.sum(s ** 2)
        return jax.grad(loss)

    pick_s = lambda s: 0.0 * s[:1, :1, :1, :1].sum()[None, None, None, None]
    pick_g = lambda g: 0.0 * g["b2"][None, None, None, :1]

    for name, fn, pick in (
        ("fused fwd", jax.jit(f_fwd), lambda s: s * 0.0),
        ("xla fwd", jax.jit(x_fwd), lambda s: s * 0.0),
        ("fused grad", jax.jit(mk_grad(f_fwd)),
         lambda g: g["b2"][None, None, None, :16] * 0.0),
        ("xla grad", jax.jit(mk_grad(x_fwd)),
         lambda g: g["b2"][None, None, None, :16] * 0.0),
    ):
        t0 = time.time()
        ms = timeit(fn, params, x, args.reps, pick)
        print(f"{name}: {ms:.2f} ms  (compile+bench {time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
