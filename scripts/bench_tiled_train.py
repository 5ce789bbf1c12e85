"""Hardware validation + A/B of the TILED fori-over-tiles flat backward —
the round-3 path that puts the flagship 256² training presets (BASELINE
configs 2-4) on the fused custom-VJP pair.

Checks, all on real TPU:
1. grad parity vs jax.grad through the XLA scan at 256² with
   deterministic masks (update_rate=1.0);
2. deterministic replay + FD check on the stochastic path;
3. A/B: 256² b2 64-step rollout grad, tiled fused vs XLA per-step remat,
   for c12/fc96 (configs 2&4) and c16/fc128 single-scale (config-3 channel
   count; multiscale perception is gated separately).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def timeit(fn, arg, iters=8, warmup=2):
    for _ in range(warmup):
        out = fn(arg)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(arg)
    fetch(out)
    return (time.perf_counter() - t0) / iters


def main():
    t0 = time.perf_counter()
    fetch(jax.jit(lambda x: x + 1)(jnp.ones(8)))
    print(f"warmup jit: {time.perf_counter()-t0:.0f}s", flush=True)

    from vsnca_tpu.config import NCAConfig
    from vsnca_tpu.models.dynca import (
        dynca_init, dynca_rollout, dynca_seed, make_conditioning,
    )
    from vsnca_tpu.ops.pallas_train import (
        fused_rollout_train_flat,
        plan_flat_train,
    )

    size, b, steps = 256, 2, 64
    cfg = NCAConfig(c_in=12, fc_dim=96, conditioning="pos_emb",
                    padding_mode="circular")
    print("plan c12/96 @256:",
          plan_flat_train(cfg, size, size, steps, need_dcond=False),
          flush=True)
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = dynca_seed(cfg, b, size)
    cond = make_conditioning(cfg, (size, size), batch=b)
    key = jax.random.PRNGKey(2)

    # --- 1. grad parity at 256², deterministic masks ---
    cfg1 = NCAConfig(c_in=12, fc_dim=96, conditioning="pos_emb",
                     padding_mode="circular", update_rate=1.0)

    def loss_tiled1(p):
        s, rgb = fused_rollout_train_flat(p, x, 7.0, cfg1, 8, cond_nhwc=cond,
                                          cond_no_grad=True)
        return jnp.mean(rgb ** 2)

    def loss_scan1(p):
        s, rgb = dynca_rollout(p, x, key, cfg1, 8, cond=cond, remat="none")
        return jnp.mean(rgb ** 2)

    t0 = time.perf_counter()
    gf = jax.jit(jax.grad(loss_tiled1))(params)
    fetch(gf)
    print(f"tiled pair compile+first (8 steps): "
          f"{time.perf_counter()-t0:.0f}s", flush=True)
    gs = jax.jit(jax.grad(loss_scan1))(params)
    worst = 0.0
    for k in gf:
        sc = float(jnp.abs(gs[k]).max()) + 1e-12
        err = float(jnp.max(jnp.abs(gf[k] - gs[k]))) / sc
        worst = max(worst, err)
        print(f"grad parity (rate=1.0) {k}: rel_err={err:.2e}", flush=True)
    assert worst < 1e-4, f"grad parity failed: {worst}"

    # --- 2. determinism + FD on the stochastic path ---
    def loss_tiled(p, seed):
        s, rgb = fused_rollout_train_flat(p, x, seed, cfg, 8, cond_nhwc=cond,
                                          cond_no_grad=True)
        return jnp.mean(rgb ** 2)

    vg = jax.jit(jax.value_and_grad(loss_tiled))
    (v1, g1), (v2, g2) = vg(params, 13.0), vg(params, 13.0)
    v3, _ = vg(params, 14.0)
    same = float(v1) == float(v2) and all(
        np.array_equal(np.asarray(g1[k]), np.asarray(g2[k])) for k in g1
    )
    print(f"deterministic replay: {same}; seed sensitivity: "
          f"{float(v1) != float(v3)}", flush=True)
    assert same

    eps = 1e-3
    d = jax.tree_util.tree_map(
        lambda a: jax.random.normal(jax.random.PRNGKey(9), a.shape, a.dtype),
        params,
    )
    pp = jax.tree_util.tree_map(lambda a, e: a + eps * e, params, d)
    pm = jax.tree_util.tree_map(lambda a, e: a - eps * e, params, d)
    (v_p, _), (v_m, _) = vg(pp, 13.0), vg(pm, 13.0)
    fd = (float(v_p) - float(v_m)) / (2 * eps)
    an = float(sum(jnp.vdot(g1[k], d[k]) for k in g1))
    rel = abs(fd - an) / (abs(fd) + 1e-12)
    print(f"FD check: fd={fd:.6f} analytic={an:.6f} rel={rel:.2%}",
          flush=True)
    assert rel < 0.02

    # --- 3. A/B rollout-grad timing at 256² ---
    for (ci, fd_, cnd, label) in (
        (12, 96, "pos_emb", "c12/fc96 (configs 2&4)"),
        (16, 128, None, "c16/fc128 single-scale (config-3 channels)"),
    ):
        cfgx = NCAConfig(c_in=ci, fc_dim=fd_, conditioning=cnd,
                         padding_mode="circular")
        print(f"plan {label}:",
              plan_flat_train(cfgx, size, size, steps, need_dcond=False),
              flush=True)
        px = dynca_init(jax.random.PRNGKey(0), cfgx)
        xx = dynca_seed(cfgx, b, size)
        cc = make_conditioning(cfgx, (size, size), batch=b)

        def loss_f(p, sd):
            s, rgb = fused_rollout_train_flat(
                p, xx, sd, cfgx, steps, cond_nhwc=cc, cond_no_grad=True)
            return jnp.mean(rgb ** 2) + jnp.mean(s ** 2)

        def loss_x(p, kk):
            s, rgb = dynca_rollout(p, xx, kk, cfgx, steps, cond=cc,
                                   remat="per_step")
            return jnp.mean(rgb ** 2) + jnp.mean(s ** 2)

        g_f = jax.jit(jax.grad(loss_f))
        g_x = jax.jit(jax.grad(loss_x))
        t0 = time.perf_counter()
        out = g_f(px, 17.0)
        fetch(out)
        print(f"[{label}] tiled compile+first: "
              f"{time.perf_counter()-t0:.0f}s", flush=True)
        tf = timeit(lambda p: g_f(p, 17.0), px, iters=10)
        tx = timeit(lambda p: g_x(p, key), px, iters=10)
        print(f"[{label}] rollout grad 256² b{b} {steps}-step: "
              f"tiled {1000*tf:.1f} ms vs XLA {1000*tx:.1f} ms "
              f"({tx/tf:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
