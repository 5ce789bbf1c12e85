"""Remat-policy A/B for the video_motion rollout BPTT on TPU.

Times fwd and fwd+bwd of the tapped 3x64-step rollout (256px, b3, c16,
multiscale) under per_step / segment:K remat, plus the full train iteration
with and without precomputed target features.
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


def timeit(fn, arg, iters=6, warmup=2):
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
    from vsnca_tpu.models.dynca import (
        dynca_init, dynca_rollout_with_taps, dynca_seed, make_conditioning,
    )
    from vsnca_tpu.train.presets import PRESETS

    nca_cfg, loss_cfg, train_cfg = PRESETS["video_motion"]()
    b = train_cfg.batch_size
    size = train_cfg.img_size[0]
    n_frames, tap_every = 3, 64

    params = dynca_init(jax.random.PRNGKey(0), nca_cfg)
    x = dynca_seed(nca_cfg, b, size)
    cond = make_conditioning(nca_cfg, (size, size), batch=b)
    key = jax.random.PRNGKey(1)

    for remat in ("per_step", "segment:4", "segment:8", "segment:16",
                  "segment:32"):

        @jax.jit
        def roll_grad(p, remat=remat):
            def obj(p):
                state, frames = dynca_rollout_with_taps(
                    p, x, key, nca_cfg, n_frames, tap_every, cond=cond,
                    remat=remat,
                )
                return jnp.sum(state ** 2) + jnp.sum(frames ** 2)
            return jax.grad(obj)(p)

        try:
            t = timeit(roll_grad, params)
            print(f"rollout fwd+bwd remat={remat:12s}: {1000*t:.1f} ms",
                  flush=True)
        except Exception as e:
            print(f"rollout fwd+bwd remat={remat:12s}: FAILED "
                  f"{repr(e)[:120]}", flush=True)

    # ---- A/B: matmul-based bilinear resize inside multiscale perception ----
    from vsnca_tpu.ops.grid_sample import resize_matrix
    from vsnca_tpu.ops.perception import perceive
    from vsnca_tpu.models.dynca import to_rgb

    h = w = size
    d_h = jnp.asarray(resize_matrix(h // 2, h))     # [H/2, H]
    d_w = jnp.asarray(resize_matrix(w // 2, w))     # [W/2, W]
    u_h = jnp.asarray(resize_matrix(h, h // 2))
    u_w = jnp.asarray(resize_matrix(w, w // 2))

    def perceive_ms_mm(xx):
        z0 = perceive(xx, nca_cfg.padding_mode)
        xs = jnp.einsum("oh,bhwc->bowc", d_h, xx)
        xs = jnp.einsum("pw,bowc->bopc", d_w, xs)   # [B, H/2, W/2, C]
        z1 = perceive(xs, nca_cfg.padding_mode)
        z1 = jnp.einsum("ho,bopc->bhpc", u_h, z1)
        z1 = jnp.einsum("wp,bhpc->bhwc", u_w, z1)   # [B, H, W, 4C]
        return (z0 + z1) * 0.5

    def step_mm(xx, sub):
        y = perceive_ms_mm(xx)
        if cond is not None:
            y = jnp.concatenate([y, cond], axis=-1)
        hmid = jax.nn.relu(
            jnp.einsum("bhwf,fd->bhwd", y, params["w1"]) + params["b1"]
        )
        dx = jnp.einsum("bhwd,dc->bhwc", hmid, params["w2"]) + params["b2"]
        bb, hh, ww, _ = xx.shape
        mask = jnp.floor(jax.random.uniform(sub, (bb, hh, ww, 1)) + 0.5)
        return xx + dx * mask

    @jax.jit
    def roll_mm_grad(p):
        def obj(p):
            def body(c, _):
                xx, k = c
                k, sub = jax.random.split(k)
                return (jax.checkpoint(step_mm)(xx, sub), k), None
            (xx, _), _ = jax.lax.scan(body, (x, key), None,
                                      length=n_frames * tap_every)
            return jnp.sum(xx ** 2)
        return jax.grad(lambda pp: obj(pp))(p)

    try:
        # sanity: values match the gather-based multiscale perceive
        from vsnca_tpu.ops.perception import perceive_multiscale
        xt = jax.random.uniform(jax.random.PRNGKey(5), (1, size, size,
                                                        nca_cfg.c_in)) - 0.5
        a = perceive_multiscale(xt, (0, 1), nca_cfg.padding_mode)
        bv = perceive_ms_mm(xt)
        err = float(jnp.max(jnp.abs(a - bv)))
        print(f"mm-resize perception max_err vs gather: {err:.2e}", flush=True)
        t = timeit(roll_mm_grad, params)
        print(f"rollout fwd+bwd mm-resize per_step: {1000*t:.1f} ms", flush=True)
    except Exception as e:
        print(f"mm-resize A/B FAILED: {repr(e)[:150]}", flush=True)

    from vsnca_tpu.infer.benchmark import benchmark_train_step

    for pre in (False, True):
        r = benchmark_train_step("video_motion", iters=4, step_n=128,
                                 precompute_targets=pre)
        print(f"full train iter precompute={pre}: "
              f"{r['sec_per_train_iter']*1000:.1f} ms "
              f"({r['train_iters_per_sec']:.2f} it/s)", flush=True)


if __name__ == "__main__":
    main()
