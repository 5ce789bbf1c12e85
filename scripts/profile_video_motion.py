"""Stage-wise timing of the video_motion train iteration on TPU.

One process, one warmup; times each component of the 1.8 it/s workload to
find where the ~550 ms goes. Not part of the library — a dev tool.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def timeit(fn, *args, iters=8, warmup=2, chain=None):
    """Time fn(*args); if chain is given, it maps output->replacement arg0."""
    a0 = args[0]
    for _ in range(warmup):
        out = fn(a0, *args[1:])
        if chain is not None:
            a0 = chain(out)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(a0, *args[1:])
        if chain is not None:
            a0 = chain(out)
    fetch(out)
    return (time.perf_counter() - t0) / iters


def main():
    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    fetch(jax.jit(lambda x: x + 1)(jnp.ones(8)))
    print(f"warmup jit: {time.perf_counter()-t0:.1f}s", flush=True)

    from vsnca_tpu.models.dynca import (
        dynca_init, dynca_rollout_with_taps, dynca_seed, make_conditioning,
    )
    from vsnca_tpu.models.msoe import load_msoe, motion_pair_from_rgb, msoe_forward
    from vsnca_tpu.models.vgg import load_vgg16, vgg16_features
    from vsnca_tpu.losses.orchestrator import LossState, make_loss_fn
    from vsnca_tpu.train.presets import PRESETS

    nca_cfg, loss_cfg, train_cfg = PRESETS["video_motion"]()
    b = train_cfg.batch_size
    size = train_cfg.img_size[0]
    step_n, n_frames, tap_every = 128, 3, 64

    key = jax.random.PRNGKey(0)
    params = dynca_init(key, nca_cfg)
    x = dynca_seed(nca_cfg, b, size)
    cond = make_conditioning(nca_cfg, (size, size), batch=b)

    # --- rollout forward only (tapped) ---
    from functools import partial

    @partial(jax.jit, static_argnames=())
    def roll_fwd(x, key):
        state, frames = dynca_rollout_with_taps(
            params, x, key, nca_cfg, n_frames, tap_every, cond=cond,
            remat="none",
        )
        return state

    t = timeit(roll_fwd, x, key, chain=lambda s: s)
    print(f"rollout fwd ({step_n} buckets n_frames*tap={n_frames}x{tap_every}):"
          f" {1000*t:.1f} ms  ({1000*t/(n_frames*tap_every):.3f} ms/step)",
          flush=True)

    # --- rollout fwd+bwd (per-step remat, grads wrt params) ---
    @jax.jit
    def roll_grad(p, x, key):
        def obj(p):
            state, frames = dynca_rollout_with_taps(
                p, x, key, nca_cfg, n_frames, tap_every, cond=cond,
                remat="per_step",
            )
            return jnp.sum(state ** 2) + sum(jnp.sum(f ** 2) for f in frames)
        return jax.grad(obj)(p)

    t = timeit(lambda p: roll_grad(p, x, key), params, chain=None)
    print(f"rollout fwd+bwd (per_step remat): {1000*t:.1f} ms", flush=True)

    @jax.jit
    def roll_grad_none(p, x, key):
        def obj(p):
            state, frames = dynca_rollout_with_taps(
                p, x, key, nca_cfg, n_frames, tap_every, cond=cond,
                remat="none",
            )
            return jnp.sum(state ** 2) + sum(jnp.sum(f ** 2) for f in frames)
        return jax.grad(obj)(p)

    try:
        t = timeit(lambda p: roll_grad_none(p, x, key), params)
        print(f"rollout fwd+bwd (remat=none):     {1000*t:.1f} ms", flush=True)
    except Exception as e:  # likely OOM
        print("rollout fwd+bwd remat=none failed:", repr(e)[:200], flush=True)

    # --- feature extractors ---
    vgg, _ = load_vgg16()
    msoe, _ = load_msoe()
    img = jax.random.uniform(jax.random.PRNGKey(1), (b, size, size, 3)) - 0.5

    vgg_fwd = jax.jit(lambda im: vgg16_features(vgg, (im + 1) / 2))
    t = timeit(vgg_fwd, img)
    print(f"VGG fwd b{b}@{size}: {1000*t:.2f} ms", flush=True)

    pair = motion_pair_from_rgb(img, img * 0.9, (size, size))
    msoe_fwd = jax.jit(
        lambda pr: msoe_forward(msoe, pr, return_features=True)[1][0]
    )
    t = timeit(msoe_fwd, pair)
    print(f"MSOE fwd b{b}@{size} pair: {1000*t:.2f} ms", flush=True)

    # --- full loss fwd and fwd+bwd wrt generated frames ---
    loss_state = LossState(cfg=loss_cfg, vgg_params=vgg, msoe_params=msoe)
    loss_fn = make_loss_fn(loss_state)
    frames = [img * (0.8 + 0.1 * i) for i in range(n_frames)]
    tgt = [img * (0.7 + 0.1 * i) for i in range(n_frames)]
    style = img

    def build_inputs(fr):
        return {
            "nca_state": x,
            "generated_image_list": fr,
            "generated_image_list_motion": fr,
            "target_motion_image_list": tgt,
            "target_image_list": [style] * n_frames,
            "step_n": jnp.asarray(float(step_n)),
        }

    lf = jax.jit(lambda fr, k: loss_fn(build_inputs(fr), k)[0])
    t = timeit(lambda fr: lf(fr, key), frames)
    print(f"loss fwd: {1000*t:.2f} ms", flush=True)

    lg = jax.jit(lambda fr, k: jax.grad(
        lambda fr: loss_fn(build_inputs(fr), k)[0]
    )(fr))
    t = timeit(lambda fr: lg(fr, key), frames)
    print(f"loss fwd+bwd(frames): {1000*t:.2f} ms", flush=True)

    # --- appearance term alone / video-motion term alone ---
    from vsnca_tpu.losses.appearance import appearance_loss
    from vsnca_tpu.losses.video_motion import video_motion_loss

    ap = jax.jit(lambda fr, k: sum(
        appearance_loss(vgg, g, style, "OT", k, 1000, 32) for g in fr
    ))
    t = timeit(lambda fr: ap(fr, key), frames)
    print(f"appearance OT x{n_frames} fwd: {1000*t:.2f} ms", flush=True)

    apg = jax.jit(lambda fr, k: jax.grad(
        lambda fr: sum(appearance_loss(vgg, g, style, "OT", k, 1000, 32)
                       for g in fr)
    )(fr))
    t = timeit(lambda fr: apg(fr, key), frames)
    print(f"appearance OT x{n_frames} fwd+bwd: {1000*t:.2f} ms", flush=True)

    vm = jax.jit(lambda fr, k: video_motion_loss(
        msoe, fr, tgt, "MotionOT", k, (size, size), 1000, 32
    )[0])
    t = timeit(lambda fr: vm(fr, key), frames)
    print(f"video motion OT fwd: {1000*t:.2f} ms", flush=True)

    vmg = jax.jit(lambda fr, k: jax.grad(
        lambda fr: video_motion_loss(
            msoe, fr, tgt, "MotionOT", k, (size, size), 1000, 32
        )[0]
    )(fr))
    t = timeit(lambda fr: vmg(fr, key), frames)
    print(f"video motion OT fwd+bwd: {1000*t:.2f} ms", flush=True)

    # --- the full train iteration for reference ---
    from vsnca_tpu.infer.benchmark import benchmark_train_step

    r = benchmark_train_step("video_motion", iters=5, step_n=step_n)
    print("full train iter:", r, flush=True)


if __name__ == "__main__":
    main()
