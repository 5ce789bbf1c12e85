"""Hardware probe: ms (perception_scales (0,1)) flat tiled VJP pair at the
flagship video-motion shape (256^2, c16/fc128, pos_emb) — does the tiled
backward fit Mosaic's scoped-vmem, and what does it cost vs the XLA grad?

Usage: python scripts/bench_ms_train.py [--size 256] [--steps 64] [--batch 2]
"""
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--rate", type=float, default=1.0)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--no-bypass", action="store_true")
    args = ap.parse_args()

    h = w = args.size
    cfg = NCAConfig(c_in=16, fc_dim=128, padding_mode="circular",
                    perception_scales=(0, 1), conditioning="pos_emb",
                    update_rate=args.rate)

    print("warmup trivial jit...", flush=True)
    t0 = time.time()
    fetch(jax.jit(lambda v: v + 1)(jnp.ones(8)))
    print(f"  {time.time() - t0:.1f}s", flush=True)

    if not args.no_bypass:
        pt.bwd_tiled_vmem_bytes_estimate = lambda *a, **k: 0
    plan = pt.plan_flat_train(cfg, h, w, args.steps, need_dcond=False,
                              force_mode="tiled")
    print("plan:", plan, flush=True)
    assert plan is not None

    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (args.batch, h, w, cfg.c_in),
                           minval=-0.5, maxval=0.5)
    cond = make_conditioning(cfg, (h, w), batch=args.batch)

    def lf(p, xx):
        s, rgb = pt.fused_rollout_train_flat(
            p, xx, 5.0, cfg, args.steps, cond_nhwc=cond, cond_no_grad=True,
            force_mode="tiled")
        return jnp.sum(rgb ** 2) + 0.1 * jnp.sum(s ** 2)

    def ls(p, xx):
        s, rgb = dynca_rollout(p, xx, jax.random.PRNGKey(2), cfg, args.steps,
                               cond=cond, remat="per_step")
        return jnp.sum(rgb ** 2) + 0.1 * jnp.sum(s ** 2)

    gf_fn = jax.jit(jax.grad(lf))
    gs_fn = jax.jit(jax.grad(ls))

    print("compiling fused pair...", flush=True)
    t0 = time.time()
    gf = gf_fn(params, x)
    fetch(gf["w1"])
    print(f"  fused compile+run {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    gs = gs_fn(params, x)
    fetch(gs["w1"])
    print(f"  xla compile+run {time.time() - t0:.1f}s", flush=True)

    if args.rate == 1.0:
        worst = 0.0
        for a, b in zip(jax.tree_util.tree_leaves(gf),
                        jax.tree_util.tree_leaves(gs)):
            scale = float(jnp.abs(b).max()) + 1e-12
            worst = max(worst, float(jnp.abs(a - b).max()) / scale)
        print(f"grad parity worst rel err: {worst:.2e}", flush=True)

    # timing: chain through a data dependency, fence with a host fetch
    for name, fn in (("fused", gf_fn), ("xla", gs_fn)):
        acc = x
        t0 = time.time()
        for _ in range(args.reps):
            g = fn(params, acc)
            acc = acc + 0.0 * g["b2"][None, None, None, :16].sum()
        fetch(acc)
        dt = (time.time() - t0) / args.reps * 1e3
        print(f"{name}: {dt:.2f} ms/grad ({args.steps} steps, "
              f"b{args.batch}, {h}x{w})", flush=True)


if __name__ == "__main__":
    main()
