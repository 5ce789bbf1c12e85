"""A/B: NHWC vs NCHW layout for the PURE-XLA multiscale rollout BPTT
(the video_motion preset's hot path, which the Pallas VJP cannot cover).

NHWC puts C=16 on the lane axis (padded to 128 by layout); NCHW puts W
there — the flat-kernel lesson applied to the XLA path.
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
    from vsnca_tpu.config import NCAConfig
    from vsnca_tpu.models.dynca import (
        dynca_init, dynca_rollout_with_taps, dynca_seed, make_conditioning,
    )
    from vsnca_tpu.ops.filters import LAPLACIAN, SOBEL_X, SOBEL_Y

    cfg = NCAConfig(c_in=16, fc_dim=128, conditioning="pos_emb",
                    padding_mode="circular", perception_scales=(0, 1))
    b, size = 3, 256
    n_frames, tap_every = 3, 64
    params = dynca_init(jax.random.PRNGKey(0), cfg)
    x = dynca_seed(cfg, b, size)
    cond = make_conditioning(cfg, (size, size), batch=b)
    key = jax.random.PRNGKey(1)

    # ---- NHWC production path (plain rollout, same step count) ----
    from vsnca_tpu.models.dynca import dynca_rollout

    @jax.jit
    def g_nhwc(p):
        def obj(p):
            s, _ = dynca_rollout(
                p, x, key, cfg, n_frames * tap_every, cond=cond,
                remat="segment:8",
            )
            return jnp.sum(s ** 2)
        return jax.grad(obj)(p)

    # ---- NCHW mirror (same math; layout moved) ----
    sx, sy, lap = SOBEL_X, SOBEL_Y, LAPLACIAN  # python lists: static taps

    def perceive_ms_chw(z):
        def perceive1(zz, hw):
            s1, s2, s3 = [o for o in stencils_chw_at(zz, hw)]
            return jnp.concatenate([zz, s1, s2, s3], axis=1)

        def stencils_chw_at(zz, hw):
            p = jnp.pad(zz, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="wrap")
            outs = []
            for k in (sx, sy, lap):
                acc = 0.0
                for di in range(3):
                    for dj in range(3):
                        kv = float(k[di][dj])
                        if kv == 0.0:
                            continue
                        acc = acc + kv * p[:, :, di:di + hw, dj:dj + hw]
                outs.append(acc)
            return outs

        z0 = perceive1(z, size)
        zh = jax.image.resize(z, z.shape[:2] + (size // 2, size // 2),
                              "linear", antialias=False)
        z1 = perceive1(zh, size // 2)
        z1 = jax.image.resize(z1, z1.shape[:2] + (size, size), "linear",
                              antialias=False)
        return (z0 + z1) * 0.5

    cond_chw = jnp.transpose(cond, (0, 3, 1, 2))

    def step_chw(p, z, sub):
        y = perceive_ms_chw(z)
        y = jnp.concatenate([y, cond_chw], axis=1)
        h = jax.nn.relu(
            jnp.einsum("bfhw,fd->bdhw", y, p["w1"])
            + p["b1"][None, :, None, None]
        )
        dx = (
            jnp.einsum("bdhw,dc->bchw", h, p["w2"])
            + p["b2"][None, :, None, None]
        )
        mask = jnp.floor(
            jax.random.uniform(sub, (z.shape[0], 1) + z.shape[2:]) + 0.5
        )
        return z + dx * mask

    @jax.jit
    def g_chw(p):
        def obj(p):
            z = jnp.transpose(x, (0, 3, 1, 2))

            def block(z, k):
                def body(c, _):
                    z, k = c
                    k, sub = jax.random.split(k)
                    return (step_chw(p, z, sub), k), None
                (z, k), _ = jax.lax.scan(body, (z, k), None, length=8)
                return z, k

            def seg(c, _):
                z, k = c
                z, k = jax.checkpoint(block)(z, k)
                return (z, k), None

            (z, _), _ = jax.lax.scan(
                seg, (z, key), None, length=n_frames * tap_every // 8
            )
            return jnp.sum(z ** 2)
        return jax.grad(obj)(p)

    for name, fn in (("nhwc", g_nhwc), ("nchw", g_chw)):
        t0 = time.perf_counter()
        out = fn(params)
        fetch(out)
        print(f"{name} compile+first: {time.perf_counter()-t0:.1f}s",
              flush=True)
        t = timeit(fn, params)
        print(f"rollout fwd+bwd 192st ms [{name}]: {1000*t:.1f}", flush=True)


if __name__ == "__main__":
    main()
