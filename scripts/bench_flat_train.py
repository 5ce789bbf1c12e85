"""Hardware validation + A/B of the FLAT custom-VJP training kernels vs the
CHW pair and the XLA scan, on the static_texture shape (128px, b4, 64-step
BPTT, Gram loss).
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
    fetch(jax.jit(lambda x: x + 1)(jnp.ones(8)))
    from vsnca_tpu.config import NCAConfig
    from vsnca_tpu.models.dynca import dynca_init, dynca_rollout, dynca_seed
    from vsnca_tpu.models.vgg import load_vgg16
    from vsnca_tpu.losses.appearance import appearance_loss
    from vsnca_tpu.ops.pallas_train import (
        fused_rollout_train,
        fused_rollout_train_flat,
        fused_train_flat_supported,
        fused_train_supported,
    )

    size, b, steps = 128, 4, 64
    cfg = NCAConfig(c_in=12, fc_dim=96, conditioning="pos_emb",
                    padding_mode="circular")
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = dynca_seed(cfg, b, size)
    from vsnca_tpu.models.dynca import make_conditioning

    cond = make_conditioning(cfg, (size, size), batch=b)
    vgg, _ = load_vgg16()
    style = jax.random.uniform(jax.random.PRNGKey(1), (b, size, size, 3)) * 2 - 1
    key = jax.random.PRNGKey(2)
    print(f"chw supported: {fused_train_supported(cfg, size, size, steps)} "
          f"flat supported: {fused_train_flat_supported(cfg, size, size, steps)}",
          flush=True)

    # --- hardware determinism + FD check for the flat pair ---
    cfg1 = NCAConfig(c_in=12, fc_dim=96, conditioning="pos_emb",
                     padding_mode="circular", update_rate=1.0)

    def loss_flat1(p):
        s, rgb = fused_rollout_train_flat(p, x, 7.0, cfg1, 8, cond_nhwc=cond)
        return jnp.mean(rgb ** 2)

    def loss_scan1(p):
        s, rgb = dynca_rollout(p, x, key, cfg1, 8, cond=cond, remat="none")
        return jnp.mean(rgb ** 2)

    gf = jax.jit(jax.grad(loss_flat1))(params)
    gs = jax.jit(jax.grad(loss_scan1))(params)
    for k in gf:
        sc = float(jnp.abs(gs[k]).max()) + 1e-12
        err = float(jnp.max(jnp.abs(gf[k] - gs[k]))) / sc
        print(f"grad parity (rate=1.0) {k}: rel_err={err:.2e}", flush=True)

    # determinism of the stochastic path: same seed -> same value+grad
    def loss_flat(p, seed):
        s, rgb = fused_rollout_train_flat(p, x, seed, cfg, 8, cond_nhwc=cond)
        return jnp.mean(rgb ** 2)

    vg = jax.jit(jax.value_and_grad(loss_flat))
    (v1, g1), (v2, g2) = vg(params, 13.0), vg(params, 13.0)
    v3, _ = vg(params, 14.0)
    same = float(v1) == float(v2) and all(
        np.array_equal(np.asarray(g1[k]), np.asarray(g2[k])) for k in g1
    )
    print(f"deterministic replay: {same}; different seed changes value: "
          f"{float(v1) != float(v3)}", flush=True)

    # FD check on the stochastic path (fixed seed -> smooth in params)
    eps = 1e-3
    d = jax.tree_util.tree_map(
        lambda a: jax.random.normal(jax.random.PRNGKey(9), a.shape, a.dtype),
        params,
    )
    pp = jax.tree_util.tree_map(lambda a, b: a + eps * b, params, d)
    pm = jax.tree_util.tree_map(lambda a, b: a - eps * b, params, d)
    v_p, _ = vg(pp, 13.0)
    v_m, _ = vg(pm, 13.0)
    fd = (float(v_p) - float(v_m)) / (2 * eps)
    an = float(sum(jnp.vdot(g1[k], d[k]) for k in g1))
    print(f"FD check: fd={fd:.6f} analytic={an:.6f} "
          f"rel={abs(fd-an)/(abs(fd)+1e-12):.2%}", flush=True)

    # --- A/B: full train-like objective (rollout + Gram + grads) ---
    def make_loss(roll):
        def loss(p, seed_or_key):
            s, rgb = roll(p, seed_or_key)
            l = appearance_loss(vgg, rgb, style, "Gram")
            return l + 100.0 * jnp.mean(
                jnp.abs(s - jnp.clip(s, -1.0, 1.0))
            )
        return jax.jit(jax.grad(loss))

    g_flat = make_loss(lambda p, sd: fused_rollout_train_flat(
        p, x, sd, cfg, steps, cond_nhwc=cond))
    g_chw = make_loss(lambda p, sd: fused_rollout_train(
        p, x, sd, cfg, steps, cond_nhwc=cond))
    g_xla = make_loss(lambda p, kk: dynca_rollout(
        p, x, kk, cfg, steps, cond=cond, remat="per_step"))

    for name, fn, arg in (
        ("flat", g_flat, 17.0),
        ("chw", g_chw, 17.0),
        ("xla", g_xla, key),
    ):
        t0 = time.perf_counter()
        out = fn(params, arg)
        fetch(out)
        print(f"{name} compile+first: {time.perf_counter()-t0:.1f}s",
              flush=True)
        t = timeit(lambda p: fn(p, arg), params, iters=10)
        print(f"train-objective grad [{name}]: {1000*t:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
