"""Stage-wise timing of the PRODUCTION video_motion train iteration (r3b).

Times, in one hardware process (unchained min-of-N fencing — see
CLAUDE.md on axon block_until_ready):
  1. full train iteration, rollout_path auto (fused chunks) and xla,
     with precomputed target features — the BENCH_r03 workload;
  2. fused pair fwd_call / grad at the chunk shape (256^2 ms c16, 64 steps);
  3. loss-only fwd and fwd+bwd wrt frames with precomputed target features
     (exactly the in-step loss subgraph);
  4. appearance-only (stacked 9-image VGG OT) and video-motion-only
     (stacked MSOE MotionOT) fwd+bwd;
  5. optimizer/grad-normalize overhead (tiny-param tree).

Not part of the library — a dev tool.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(jax.device_get(leaf)).ravel()[0]


def timeit(fn, iters=6, warmup=2):
    """Unchained: each call same inputs; fence each call with a host fetch.
    min-of-iters (dispatch noise is one-sided on this stack)."""
    for _ in range(warmup):
        fetch(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import os

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/vsnca_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    fetch(jax.jit(lambda x: x + 1)(jnp.ones(8)))
    print(f"warmup jit: {time.perf_counter()-t0:.1f}s", flush=True)

    from vsnca_tpu.losses.appearance import precompute_target_style_features
    from vsnca_tpu.losses.orchestrator import LossState, make_loss_fn
    from vsnca_tpu.losses.video_motion import precompute_target_motion_features
    from vsnca_tpu.models.dynca import dynca_init, dynca_seed, make_conditioning
    from vsnca_tpu.models.msoe import load_msoe
    from vsnca_tpu.models.vgg import load_vgg16
    from vsnca_tpu.train.presets import PRESETS

    nca_cfg, loss_cfg, train_cfg = PRESETS["video_motion"]()
    b = train_cfg.batch_size
    size = train_cfg.img_size[0]
    n_frames, tap_every = 3, 64
    print(f"preset video_motion: b={b} size={size} c_in={nca_cfg.c_in} "
          f"fc={nca_cfg.fc_dim} scales={nca_cfg.perception_scales}",
          flush=True)

    key = jax.random.PRNGKey(0)
    params = dynca_init(key, nca_cfg)
    x = dynca_seed(nca_cfg, b, (size, size))
    cond = make_conditioning(nca_cfg, (size, size), batch=b)
    vgg, _ = load_vgg16()
    msoe, _ = load_msoe()

    kimg = jax.random.PRNGKey(1)
    img = jax.random.uniform(kimg, (b, size, size, 3)) - 0.5
    frames = [img * (0.8 + 0.1 * i) for i in range(n_frames)]
    style = img * 0.5
    tgt_video = jnp.stack([img[0] * (0.6 + 0.05 * i) for i in range(n_frames)])

    mis = loss_cfg.motion_img_size
    tgt_motion_feats = precompute_target_motion_features(msoe, tgt_video, mis)
    tgt_style_feats = precompute_target_style_features(
        vgg, style, loss_cfg.appearance_loss_type
    )
    fetch(tgt_motion_feats)

    # ---- 2. fused pair at the chunk shape ----
    from vsnca_tpu.ops.pallas_train import (
        fused_rollout_train_flat,
        fused_train_flat_supported,
    )

    assert fused_train_flat_supported(nca_cfg, size, size, tap_every,
                                      need_dcond=False)

    @jax.jit
    def pair_fwd(x):
        s, r = fused_rollout_train_flat(
            params, x, jnp.float32(7.0), nca_cfg, tap_every,
            cond_nhwc=cond, cond_no_grad=True,
        )
        return jnp.sum(r)

    t = timeit(lambda: pair_fwd(x))
    print(f"fused fwd_call 64st: {1000*t:.1f} ms", flush=True)

    @jax.jit
    def pair_grad(p, x):
        def obj(p):
            s, r = fused_rollout_train_flat(
                p, x, jnp.float32(7.0), nca_cfg, tap_every,
                cond_nhwc=cond, cond_no_grad=True,
            )
            return jnp.sum(r) + jnp.sum(s)
        return jax.grad(obj)(p)

    t = timeit(lambda: pair_grad(params, x))
    print(f"fused grad 64st: {1000*t:.1f} ms", flush=True)

    @jax.jit
    def pair_grad3(p, x):
        def obj(p):
            acc = 0.0
            xc = x
            for i in range(n_frames):
                xc, r = fused_rollout_train_flat(
                    p, xc, jnp.float32(7.0 + i), nca_cfg, tap_every,
                    cond_nhwc=cond, cond_no_grad=True,
                )
                acc = acc + jnp.sum(r)
            return acc + jnp.sum(xc)
        return jax.grad(obj)(p)

    t = timeit(lambda: pair_grad3(params, x))
    print(f"fused grad 3x64st (chunked taps): {1000*t:.1f} ms", flush=True)

    # ---- 3. loss-only with precomputed features ----
    loss_state = LossState(cfg=loss_cfg, vgg_params=vgg, msoe_params=msoe)
    loss_fn = make_loss_fn(loss_state)

    # NOTE: the precomputed features MUST be jit ARGUMENTS — closure
    # capture inlines them as program constants and the axon remote
    # compiler rejects the >100 MB request body (HTTP 413).
    def build_inputs(fr, sf, mf):
        return {
            "nca_state": x,
            "generated_image_list": fr,
            "generated_image_list_motion": fr,
            "target_image_list": [style] * n_frames,
            "target_style_features": sf,
            "target_motion_feature_list": [
                mf[i] for i in range(n_frames - 1)
            ],
            "step_n": jnp.asarray(128.0),
        }

    lf = jax.jit(
        lambda fr, sf, mf, k: loss_fn(build_inputs(fr, sf, mf), k)[0]
    )
    t = timeit(lambda: lf(frames, tgt_style_feats, tgt_motion_feats, key))
    print(f"loss fwd (precomputed tgts): {1000*t:.2f} ms", flush=True)

    lg = jax.jit(lambda fr, sf, mf, k: jax.grad(
        lambda fr: loss_fn(build_inputs(fr, sf, mf), k)[0]
    )(fr))
    t = timeit(
        lambda: lg(frames, tgt_style_feats, tgt_motion_feats, key)
    )
    print(f"loss fwd+bwd(frames): {1000*t:.2f} ms", flush=True)

    # ---- 4. per-term fwd+bwd ----
    from vsnca_tpu.losses.appearance import appearance_loss
    from vsnca_tpu.losses.video_motion import video_motion_loss

    apg = jax.jit(lambda fr, sf, k: jax.grad(
        lambda fr: appearance_loss(
            vgg, jnp.concatenate(fr, axis=0), style, "OT", k, 1000, 32,
            target_features=sf,
        )
    )(fr))
    t = timeit(lambda: apg(frames, tgt_style_feats, key))
    print(f"appearance OT stacked x{n_frames} fwd+bwd: {1000*t:.2f} ms",
          flush=True)

    vmg = jax.jit(lambda fr, mf, k: jax.grad(
        lambda fr: video_motion_loss(
            msoe, fr, None, "MotionOT", k, mis, 1000, 32,
            target_features=[mf[i] for i in range(n_frames - 1)],
        )[0]
    )(fr))
    t = timeit(lambda: vmg(frames, tgt_motion_feats, key))
    print(f"video motion OT fwd+bwd (precomp tgt): {1000*t:.2f} ms",
          flush=True)

    # VGG raw forward for scale reference
    from vsnca_tpu.models.vgg import vgg16_features
    big = jnp.concatenate(frames, axis=0)
    vf = jax.jit(lambda im: vgg16_features(vgg, (im + 1) / 2)[-1])
    t = timeit(lambda: vf(big))
    print(f"VGG fwd b{n_frames*b}@{size}: {1000*t:.2f} ms", flush=True)

    from vsnca_tpu.models.msoe import msoe_forward
    pairb = jax.random.uniform(kimg, (2 * b, mis[0], mis[1], 2))
    mf = jax.jit(lambda pr: msoe_forward(msoe, pr, return_features=True)[1][0])
    t = timeit(lambda: mf(pairb))
    print(f"MSOE fwd b{2*b}@{mis[0]}: {1000*t:.2f} ms", flush=True)

    # bf16 probe: same appearance fwd+bwd with bf16 VGG params/activations
    # (metrics in fp32). Quantifies the precision lever on the loss side.
    vgg16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, vgg
    )
    tgt_style_feats16 = jax.tree_util.tree_map(
        lambda a: a, tgt_style_feats
    )

    apg16 = jax.jit(lambda fr, sf, k: jax.grad(
        lambda fr: appearance_loss(
            vgg16, jnp.concatenate(fr, axis=0).astype(jnp.bfloat16),
            style, "OT", k, 1000, 32, target_features=sf,
        )
    )(fr))
    try:
        t = timeit(lambda: apg16(frames, tgt_style_feats16, key))
        print(f"appearance OT bf16-vgg fwd+bwd: {1000*t:.2f} ms", flush=True)
    except Exception as e:
        print("bf16 appearance probe failed:", repr(e)[:160], flush=True)

    # ---- 5. optimizer-only ----
    import optax
    from vsnca_tpu.train.optim import make_optimizer

    opt = make_optimizer(train_cfg.lr, train_cfg.lr_decay_steps,
                         train_cfg.lr_decay_gamma)
    ost = opt.init(params)

    @jax.jit
    def opt_step(p, o):
        g = jax.tree_util.tree_map(jnp.ones_like, p)
        u, o2 = opt.update(g, o, p)
        return optax.apply_updates(p, u), o2

    t = timeit(lambda: opt_step(params, ost))
    print(f"optimizer-only: {1000*t:.2f} ms", flush=True)

    # ---- 1. full train iterations ----
    from vsnca_tpu.infer.benchmark import benchmark_train_step

    for rp in ("auto", "xla"):
        r = benchmark_train_step("video_motion", iters=6, step_n=128,
                                 rollout_path=rp, precompute_targets=True)
        print(f"full train iter [{rp}]: {r}", flush=True)


if __name__ == "__main__":
    main()
